package graft

import org.apache.spark.sql.functions._

import graft.ops.TableChecksum
import graft.tables.Catalog

class TableChecksumSpec extends SparkSuite {

  private def sums(df: org.apache.spark.sql.DataFrame) =
    TableChecksum.checksums(df, col("o_orderkey") % 16,
      graft.functions.Hash60(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_orderstatus"))))

  test("identical replicas diverge nowhere; checksums are partitioning-invariant") {
    val base = Catalog.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
    assert(TableChecksum.diverged(sums(base), sums(base.repartition(7)))
      .count() == 0L)
  }

  test("a single tampered row flips exactly its bucket") {
    val base = Catalog.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val minKey = base.agg(min(col("o_orderkey"))).head().getLong(0)
    val tampered = base.withColumn("o_orderstatus",
      when(col("o_orderkey") === minKey, lit("X"))
        .otherwise(col("o_orderstatus")))
    val bad = TableChecksum.diverged(sums(base), sums(tampered)).collect()
    assert(bad.length == 1)
    assert(bad.head.getLong(0) == minKey % 16)
  }

  test("a missing row shows up as a row-count divergence") {
    val base = Catalog.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val minKey = base.agg(min(col("o_orderkey"))).head().getLong(0)
    val short = base.filter(col("o_orderkey") =!= minKey)
    val bad = TableChecksum.diverged(sums(base), sums(short)).collect()
    assert(bad.length == 1 &&
      bad.head.getLong(3) == bad.head.getLong(4) + 1) // rows_a = rows_b + 1
  }
}
