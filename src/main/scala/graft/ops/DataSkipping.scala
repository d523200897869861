package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL DATA-SKIPPING INDEX (zone maps): per-file min/max stats
  * over a clustering column, used to prune the FILE LIST before the
  * scan — the mechanism behind Delta/Iceberg data skipping, built here
  * from plain parquet + the `_metadata.file_path` column. Parquet
  * row-group stats already skip WITHIN a file Spark decides to open;
  * this prunes whole files from the listing, which is what matters at
  * 100 TB where an unpruned listing alone costs minutes. Skipping is
  * only as good as the layout: stats are tight when the data was
  * written clustered on the column (repartitionByRange / sortWithinPartitions),
  * useless when every file spans the full value range.
  *
  * `prunedRead` collects only the surviving FILE PATHS to the driver —
  * metadata proportional to file count, exactly what any table-format
  * planner materializes; row data never leaves the executors.
  */
object DataSkipping {

  /** One scan → one stats row per file: (file, min_v, max_v, rows).
    * Persist the result next to the table and maintain it
    * incrementally on append (stats of new files union in; this build
    * is the bootstrap / full-rebuild path). */
  def buildStats(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(c)).as("min_v"), max(col(c)).as("max_v"),
        count(lit(1)).as("rows"))

  /** Read only the files whose [min_v, max_v] interval overlaps
    * [lo, hi] (inclusive), then re-apply the exact predicate — file
    * stats are a superset filter, like the bloom in BloomPrune. */
  def prunedRead(spark: SparkSession, dir: String, stats: DataFrame,
      c: String, lo: Column, hi: Column): DataFrame = {
    val files = stats
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select(col("file")).collect().map(_.getString(0))
    val src =
      if (files.isEmpty) // nothing overlaps: schema-only read, no data
        spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    src.filter(col(c) >= lo && col(c) <= hi)
  }
}
