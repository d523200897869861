package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune
import graft.tables.Catalog

class BloomPruneSpec extends SparkSuite {

  test("bloom prune is a superset of the exact match set; semiJoin equals plain semi join") {
    val fact = Catalog.lineitem(spark, sf).select(col("l_orderkey"))
    val build = Catalog.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")

    val bf = BloomPrune.buildFilter(build, col("o_orderkey"))
    val pruned = BloomPrune.prune(fact, col("l_orderkey"), bf)
    val exact = fact.join(
      build.select(col("o_orderkey")).distinct(),
      col("l_orderkey") === col("o_orderkey"), "left_semi")

    val prunedN = pruned.count()
    val exactN = exact.count()
    val factN = fact.count()
    // never drops a true match …
    assert(prunedN >= exactN)
    // … and actually prunes (urgent ≈ 20% of orders; fp rate ≪ the gap)
    assert(prunedN < factN)

    assertSameRows(
      BloomPrune.semiJoin(fact, "l_orderkey", build, "o_orderkey"),
      exact)
  }

  test("empty build side prunes everything") {
    val fact = Catalog.lineitem(spark, sf).select(col("l_orderkey"))
    val build = Catalog.orders(spark, sf).filter(lit(false))
    assert(BloomPrune.semiJoin(fact, "l_orderkey", build, "o_orderkey")
      .count() == 0L)
  }
}
