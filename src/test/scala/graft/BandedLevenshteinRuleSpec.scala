package graft

import org.apache.spark.sql.functions._

import graft.functions.BandedLevenshteinRule

class BandedLevenshteinRuleSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private lazy val df = Seq(
    ("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
    ("far", "zzzzzzzzzz"), (null, "x"))
    .toDF("a", "b")

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandedLevenshteinRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq BandedLevenshteinRule)
  }

  // plan-shape checks use a parquet-backed relation: a literal local
  // relation gets fully evaluated by ConvertToLocalRelation before the
  // plan can be inspected
  private def cust = graft.tables.Catalog.customer(spark, sf)

  test("rewrites lev <= k to the native banded form") {
    withRule {
      val q = cust.filter(levenshtein(col("c_name"), col("c_mktsegment")) <= 2)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("banded_edit_distance(c_name"), optimized)
      assert(optimized.contains(", 2) <= 2"), optimized)
    }
  }

  test("rewrite preserves results incl. null and boundary rows") {
    val plain = df.filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().map(_.toString).sorted.toSeq
    val rewritten = withRule {
      df.filter(levenshtein(col("a"), col("b")) <= 2)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(plain == rewritten)
    assert(rewritten.size == 2) // (abc,abd) dist 1, (same,same) dist 0
  }

  test("lev < k uses k-1; already-banded calls are left alone") {
    withRule {
      val lt = cust.filter(levenshtein(col("c_name"), col("c_mktsegment")) < 3)
        .queryExecution.optimizedPlan.toString
      assert(lt.contains(", 2) <= 2"), lt)
      val already = cust
        .filter(levenshtein(col("c_name"), col("c_mktsegment"), 5) >= 0)
        .queryExecution.optimizedPlan.toString
      assert(already.contains("Some(5)) >= 0"), already)
    }
  }
}
