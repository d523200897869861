package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNAPSHOT DIFF — generate a change-data-feed (insert/update/delete
  * rows) between two snapshots of the same keyed table, the inverse of
  * the MERGE upsert (q108 applies a CDC batch; this derives one). The
  * scale path is a single key-partitioned FULL OUTER join — both sides
  * shuffle once on the key, no driver state, no O(n²); at 100 TB both
  * snapshots would be bucketed/partitioned on the key so the join is
  * co-located. Value comparison is struct equality over the compared
  * columns with null-safe semantics (`<=>`), so NULL→value and
  * value→NULL transitions classify as updates, not no-ops.
  *
  * Output: key columns + `change_type` ('I' | 'U' | 'D') — unchanged
  * rows are dropped before any downstream materialization.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ compareCols
    // rename the new side up-front: both snapshots routinely derive
    // from the same source frame, and attribute-qualified refs on a
    // self-join trip DetectAmbiguousSelfJoin
    def nn(c: String): String = "__n_" + c
    val o = oldSnap.select(cols.map(col): _*)
    val n = newSnap.select(cols.map(col): _*).toDF(cols.map(nn): _*)
    val joinCond = keyCols.map(k => col(k) === col(nn(k))).reduce(_ && _)
    // presence flags: a side is absent iff its first key col is null
    // post-outer-join (key cols are non-null in the inputs by contract)
    val oldPresent = col(keyCols.head).isNotNull
    val newPresent = col(nn(keyCols.head)).isNotNull
    val changed = !(struct(compareCols.map(col): _*)
      <=> struct(compareCols.map(c => col(nn(c))): _*))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(!oldPresent, lit("I"))
          .when(!newPresent, lit("D"))
          .when(changed, lit("U")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(k =>
        coalesce(col(k), col(nn(k))).as(k)) :+ col("change_type"): _*)
  }
}
