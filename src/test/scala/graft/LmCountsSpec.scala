package graft

import org.apache.spark.sql.functions._

import graft.ops.{LmCounts, TextAnalysis}
import graft.tables.Catalog

/** The stored LM count tables ([[graft.ops.LmCounts]]) and their
  * consumers (q66 unigram logprob, q178 Jelinek-Mercer, q202
  * Kneser-Ney, q188/q193 via the shared scorer): store content must
  * equal a live recount, and consumer plans must READ the store —
  * one corpus scan, zero in-plan count training.
  */
class LmCountsSpec extends SparkSuite {

  test("stored counts equal a live recount of the corpus") {
    val (bc, cu) = LmCounts.stored(spark, sf)
    val docs = Catalog.documents(spark, sf)
      .select(TextAnalysis.tokens(col("text")).as("t"))
    val liveCu = docs.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val liveBc = docs.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    assertSameRows(cu, liveCu)
    assertSameRows(bc, liveBc)
  }

  test("LM consumers read the store: one corpus scan, counts from parquet") {
    for (q <- Seq(graft.queries.TextQueries.q66,
        graft.queries.TextQueries.q178,
        graft.queries.TextQueries.q202)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("lm_counts_"),
        s"${q.name} must read the stored LM counts:\n${plan.take(2000)}")
      // exactly one scan of the documents table: the per-doc extraction;
      // count TRAINING passes (2 more scans each) must be gone
      val docScans = "documents\\.parquet".r.findAllIn(plan).size
      assert(docScans == 1,
        s"${q.name} plans $docScans documents scans (want 1):\n${plan.take(2000)}")
    }
  }
}
