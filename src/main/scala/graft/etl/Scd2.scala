package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the dimension-side
  * companion of the fact loader ([[IncrementalLoad]]): applying a batch
  * snapshot to a versioned dim closes changed rows (valid_to = batch
  * time) and inserts new versions (valid_from = batch time,
  * is_current). History is immutable; "current" is a flag + open
  * valid_to.
  *
  * Scale: one hash join target-current × batch on the natural key (both
  * sides shuffle on the key once; the closed-history partition of the
  * target is untouched — with the target partitioned by is_current, a
  * batch touches only the current slice). Change detection compares the
  * tracked attributes null-safely (`<=>`).
  */
object Scd2 {

  /** Apply one batch snapshot. `target` columns: key ++ attrs ++
    * (valid_from, valid_to, is_current); `batch` columns: key ++ attrs.
    * Rows absent from the batch stay current (partial snapshots OK). */
  def applyBatch(target: Option[DataFrame], batch: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String], batchTs: String): DataFrame = {
    val ts = lit(batchTs).cast("timestamp")
    val fresh = batch.select(
      (keyCols ++ attrCols).map(col) :+
        ts.as("valid_from") :+
        lit(null).cast("timestamp").as("valid_to") :+
        lit(true).as("is_current"): _*)
    target match {
      case None => fresh
      case Some(t) =>
        val history = t.filter(!col("is_current"))
        val current = t.filter(col("is_current"))
        val b = batch.select(
          keyCols.map(c => col(c).as(s"b_$c")) ++
            attrCols.map(c => col(c).as(s"b_$c")): _*)
        val keyEq = keyCols.map(c => col(c) === col(s"b_$c")).reduce(_ && _)
        val joined = current.join(b, keyEq, "left")
        val changed = attrCols
          .map(c => !(col(c) <=> col(s"b_$c"))).reduce(_ || _) &&
          col(s"b_${keyCols.head}").isNotNull
        // unchanged (or absent from batch) current rows ride through
        val stillCurrent = joined.filter(!changed)
          .select(current.columns.map(col): _*)
        // changed rows: close the old version…
        val closed = joined.filter(changed)
          .select(current.columns.map(col): _*)
          .withColumn("valid_to", ts)
          .withColumn("is_current", lit(false))
        // …and emit the new one
        val opened = joined.filter(changed)
          .select(
            (keyCols ++ attrCols).map(c => col(s"b_$c").as(c)) :+
              ts.as("valid_from") :+
              lit(null).cast("timestamp").as("valid_to") :+
              lit(true).as("is_current"): _*)
        // brand-new keys
        val existingKeys = current.select(keyCols.map(col): _*).distinct()
        val newKeys = batch.join(existingKeys, keyCols, "left_anti")
        val inserted = newKeys.select(
          (keyCols ++ attrCols).map(col) :+
            ts.as("valid_from") :+
            lit(null).cast("timestamp").as("valid_to") :+
            lit(true).as("is_current"): _*)
        history.unionByName(stillCurrent).unionByName(closed)
          .unionByName(opened).unionByName(inserted)
    }
  }
}
