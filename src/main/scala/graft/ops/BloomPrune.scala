package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** SEMI-JOIN REDUCTION with a broadcast Bloom filter — the classic
  * distributed-join optimization: when a big fact joins a filtered key
  * set that is too large to broadcast as a hash relation but whose
  * MEMBERSHIP fits in a few hundred KB of bloom bits, pre-filtering the
  * fact with `might_contain` before the shuffle removes most
  * non-matching rows at the scan, so the exchange carries ~selectivity·N
  * rows instead of N. False positives are fine — the exact join still
  * runs after the prune; the bloom only shrinks its input. This is
  * exactly what Spark's own InjectRuntimeFilter does when its thresholds
  * allow; exposing it as an operator makes the plan deterministic
  * (independent of runtime-filter heuristics) and composable with any
  * downstream join, including joins Spark would never auto-filter.
  *
  * Mechanics: the build side aggregates `xxhash64(key)` into a
  * `BloomFilterAggregate` (one binary cell, partial/final merged — never
  * driver-collected row data), which is broadcast and probed per fact
  * row by the codegen'd `BloomFilterMightContain` — the same internal
  * expressions the runtime filter uses, wired explicitly.
  */
object BloomPrune {

  /** One-row, one-column (`bf` binary) DataFrame holding the bloom
    * filter over `key` of `build`. */
  def buildFilter(build: DataFrame, key: Column,
      expectedItems: Long = 100000L, numBits: Long = 1L << 22): DataFrame = {
    val hashed = new XxHash64(Seq(GraftSqlBridge.expression(key)))
    val agg = new BloomFilterAggregate(hashed,
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()
    build.agg(GraftSqlBridge.column(agg).as("bf"))
  }

  /** `might_contain(bf, xxhash64(key))` predicate column. `bf` must be
    * a constant or scalar-subquery expression (Catalyst requires the
    * bloom binary to be available at planning of the probe — pass
    * `buildFilter(...).scalar()`). */
  def mightContain(bf: Column, key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bf),
      new XxHash64(Seq(GraftSqlBridge.expression(key)))))

  /** `fact` rows whose `key` might be in `filterDf`'s bloom: the
    * one-row filter relation becomes a scalar subquery, computed once
    * and broadcast to every probe task. Superset of the exact semi join
    * (bloom false positives pass); never drops a true match. */
  def prune(fact: DataFrame, factKey: Column, filterDf: DataFrame)
      : DataFrame =
    fact.filter(mightContain(filterDf.scalar(), factKey))

  /** End-to-end: prune `fact` by `build`'s key set, then run the EXACT
    * semi join on the survivors (removing bloom false positives). */
  def semiJoin(fact: DataFrame, factKey: String, build: DataFrame,
      buildKey: String, expectedItems: Long = 100000L,
      numBits: Long = 1L << 22): DataFrame = {
    val bf = buildFilter(build, col(buildKey), expectedItems, numBits)
    prune(fact, col(factKey), bf)
      .join(build.select(col(buildKey)).distinct(),
        col(factKey) === col(buildKey), "left_semi")
  }
}
