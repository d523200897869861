package graft

import org.apache.spark.sql.functions._

import graft.ops.DataSkipping
import graft.tables.Catalog

class DataSkippingSpec extends SparkSuite {

  private val base = "/tmp/graft_skip/spec/lineitem_by_shipdate"

  private def stage(): Unit =
    Catalog.lineitem(spark, sf)
      .repartitionByRange(8, col("l_shipdate"))
      .write.mode("overwrite").parquet(base)

  test("pruned read equals direct filtered read, and actually skips files") {
    stage()
    val stats = DataSkipping.buildStats(spark, base, "l_shipdate")
    val lo = lit("1995-03-01 00:00:00").cast("timestamp")
    val hi = lit("1995-05-31 23:59:59").cast("timestamp")

    val totalFiles = stats.count()
    val survivors = stats
      .filter(col("max_v") >= lo && col("min_v") <= hi).count()
    assert(totalFiles == 8, s"expected 8 range files, got $totalFiles")
    // a 3-month slice of a ~7-year range clustered into 8 files should
    // touch at most 2 of them
    assert(survivors <= 2,
      s"range clustering failed to localize the slice: $survivors files")

    val pruned = DataSkipping.prunedRead(spark, base, stats,
      "l_shipdate", lo, hi)
    val direct = spark.read.parquet(base)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") <= hi)
    assertSameRows(pruned, direct)
  }

  test("empty overlap returns an empty frame with the table schema") {
    stage()
    val stats = DataSkipping.buildStats(spark, base, "l_shipdate")
    val out = DataSkipping.prunedRead(spark, base, stats, "l_shipdate",
      lit("2050-01-01 00:00:00").cast("timestamp"),
      lit("2050-12-31 00:00:00").cast("timestamp"))
    assert(out.count() == 0L)
    assert(out.columns.contains("l_shipdate"))
  }
}
