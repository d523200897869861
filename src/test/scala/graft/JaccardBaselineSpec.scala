package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.tables.Catalog

/** Pins the naive-vs-optimized contract behind retiring q21 from the
  * timed bench (it remains in the correctness registry): the
  * prefix-filtered all-pairs join ([[Dedup.jaccardPrefixPairs]], the
  * q78 form) must return EXACTLY the pairs of the full-inverted-index
  * baseline ([[Dedup.jaccardPairs]], the q21 form) at the same
  * threshold — the prefix + length filters are lossless, so the only
  * difference is how much of the index the candidate join touches. */
class JaccardBaselineSpec extends SparkSuite {

  private def corpus() = {
    val docs = Catalog.documents(spark, sf).select(col("doc_id"), col("text"))
    // inject near-dups so the threshold actually fires (the q19/q21
    // corpus shape: every 5th doc with a small appended tail)
    docs.unionAll(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft near dup tail")).as("text")))
  }

  test("prefix-filtered Jaccard equals the naive inverted-index baseline") {
    val t = 0.7
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))
    val naive = Dedup.jaccardPairs(corpus(), 3, t)
      .select("doc_a", "doc_b", "inter", "jaccard")
      .collect().map(key).toSet
    val prefix = Dedup.jaccardPrefixPairs(corpus(), 3, t)
      .select("doc_a", "doc_b", "inter", "jaccard")
      .collect().map(key).toSet
    assert(naive.nonEmpty, "threshold never fired — corpus has no near-dups")
    assert(prefix == naive)
  }
}
