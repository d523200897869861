package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  // 90% of the fact hits key 1 — the classic hot key
  private lazy val fact = ((1 to 900).map(i => (1, i.toDouble)) ++
    (1 to 100).map(i => (i % 7 + 2, i.toDouble))).toDF("k", "v")
  private lazy val dim = (1 to 10).map(i => (i, s"dim_$i")).toDF("dk", "name")

  test("salted join equals plain join (hot key spread over salts)") {
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("name"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select(col("k"), col("v"), col("name"))
    assertSameRows(plain, salted)
    // the physical join key must include the salt
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = fact.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(fact, "k", "v", salts = 8)
    assertSameRows(direct, salted)
  }

  test("salt is deterministic: same input, same spread") {
    val s1 = fact.withColumn("s", Skew.saltOf(8, col("k"), col("v")))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = fact.withColumn("s", Skew.saltOf(8, col("k"), col("v")))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1.size > 1) // the hot key actually spreads
  }
}
