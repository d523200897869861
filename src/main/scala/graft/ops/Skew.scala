package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (builder brief: "skewed keys → salting or
  * AQE skew-join"). AQE's runtime skew split handles sort-merge joins
  * automatically (`spark.sql.adaptive.skewJoin.enabled`, on by default);
  * these helpers cover the cases AQE can't: hot-key aggregations and
  * hash joins where one key dominates a partition.
  *
  * Salts are DETERMINISTIC (hash of the full row, mod salts) — no
  * rand() — so plans stay reproducible and retries idempotent.
  */
object Skew {

  /** Deterministic salt in [0, salts) from the given columns. */
  def saltOf(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong))

  /** Skew-safe fact × dim equi join: the dim side is replicated `salts`
    * times (explode over the salt range), the fact side picks a
    * deterministic salt, and the join key becomes (key, salt) — a hot
    * fact key now spreads over `salts` reducers. Use when the dim is too
    * big to broadcast and a fact key dominates. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      saltOf(salts, fact.columns.map(col).toSeq: _*))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for additive
    * aggregates over hot keys: phase 1 groups on (key, salt) so no
    * single reducer sees a whole hot key, phase 2 merges the ≤ salts
    * partials per key. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", saltOf(salts, df.columns.map(col).toSeq: _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
