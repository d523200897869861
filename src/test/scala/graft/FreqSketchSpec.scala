package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqSketch
import graft.tables.Catalog

class FreqSketchSpec extends SparkSuite {

  private val depth = 5
  private val width = 4096
  private val seed = 99L

  test("inner product is exact on a collision-free toy relation") {
    import SparkSpec.spark.implicits._
    // A: key 1 ×3, key 2 ×1; B: key 1 ×2, key 3 ×5 → |A⋈B| = 3·2 = 6
    val a = Seq(1L, 1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 1L, 3L, 3L, 3L, 3L, 3L).toDF("k")
    val ska = a.agg(FreqSketch.agg(col("k"), depth, width, seed).as("ska"))
    val skb = b.agg(FreqSketch.agg(col("k"), depth, width, seed).as("skb"))
    val est = ska.crossJoin(skb)
      .select(FreqSketch.innerProduct(col("ska"), col("skb")).as("est"))
      .head().getLong(0)
    // 3 keys into 5 rows of 4096 buckets: overwhelmingly collision-free,
    // and deterministic with the fixed seed — est is exactly 6
    assert(est == 6L)
  }

  test("estimate bounds the true join size and is partitioning-invariant") {
    def sketchPair(parts: Int): Long = {
      val o = Catalog.orders(spark, sf).repartition(parts)
      val l = Catalog.lineitem(spark, sf).repartition(parts)
      val skO = o.agg(FreqSketch.agg(col("o_orderkey"), depth, width, seed)
        .as("sk_o"))
      val skL = l.agg(FreqSketch.agg(col("l_orderkey"), depth, width, seed)
        .as("sk_l"))
      skO.crossJoin(skL)
        .select(FreqSketch.innerProduct(col("sk_o"), col("sk_l")).as("est"))
        .head().getLong(0)
    }
    val e1 = sketchPair(1)
    val e9 = sketchPair(9) // forces partial buffers + serialize/merge
    assert(e1 == e9, "estimate depends on physical partitioning")

    val o = Catalog.orders(spark, sf)
    val l = Catalog.lineitem(spark, sf)
    val trueSize = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    val slack = math.ceil(math.E / width * o.count() * l.count()).toLong
    assert(e1 >= trueSize, s"underestimate: $e1 < $trueSize")
    assert(e1 <= trueSize + slack, s"bound violated: $e1 > $trueSize + $slack")
  }

  test("incompatible sketch params throw rather than mis-estimate") {
    import SparkSpec.spark.implicits._
    val a = Seq(1L).toDF("k")
    val ska = a.agg(FreqSketch.agg(col("k"), depth, width, seed).as("x"))
    val skb = a.agg(FreqSketch.agg(col("k"), depth, width, seed + 1).as("y"))
    val ex = intercept[Exception] {
      ska.crossJoin(skb)
        .select(FreqSketch.innerProduct(col("x"), col("y"))).head()
    }
    assert(ex.getMessage != null)
  }
}
