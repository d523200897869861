package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank WITHOUT a global sort: the naive
  * `row_number() OVER (ORDER BY …)` plans an empty-partition window —
  * every row through ONE task, the textbook scale-killer for "number
  * the corpus in curriculum order" writes. This op computes the same
  * ranks in three parallel steps:
  *
  *   1. range-repartition + sort WITHIN partitions on the order key
  *      (parallel; boundaries from Spark's deterministic reservoir
  *      sample);
  *   2. per-partition row counts → prefix-sum offsets (one row per
  *      partition — driver-scale, the window over it is trivially
  *      tiny);
  *   3. per-partition row_number (keyed window — parallel) + broadcast
  *      offset.
  *
  * The output is deterministic whatever the sampled boundaries are, as
  * long as `order` is a TOTAL order (include a tiebreaker): shifting a
  * row across a boundary shifts the offsets by exactly one row. The
  * input is persisted so steps 2 and 3 see the same partitioning.
  */
object GlobalRank {

  /** Adds `rank` (1-based, dense in the row_number sense) under the
    * total order `order`. */
  def withRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    require(Seq("_pid", "rank").forall(!df.columns.contains(_)),
      "withRank() adds rank (and uses _pid internally); " +
        "rename conflicting input columns first")
    val parts = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = parts.groupBy(col("_pid")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("off"))
    parts.join(broadcast(offsets), "_pid")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(order: _*)) + col("off"))
      .drop("_pid")
  }
}
