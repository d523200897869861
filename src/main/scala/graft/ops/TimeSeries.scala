package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series operators: interval merging (gaps-and-islands)
  * and exact exponentially-weighted moving averages. Both are single
  * keyed-window shapes — one shuffle on the key, executor-local work
  * per group — see PERF.md rows q120/q121.
  */
object TimeSeries {

  /** Merge overlapping [s, e] intervals per key into maximal islands:
    * an island opens exactly where the running max of previous ends
    * fails to reach the current start (strict: touching intervals —
    * s == prev_end — MERGE). `tie` must make the (s, tie) order total
    * so island numbering is deterministic. Output: key, island,
    * interval_start, interval_end, n_events. Both windows and the
    * roll-up share one partitioning+sort — a single exchange. */
  def mergeIslands(df: DataFrame, key: Column, s: Column, e: Column,
      tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(s, tie)
    val prevEnd = max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevEnd.isNull || s > prevEnd, 1L).otherwise(0L)
    df.withColumn("island",
        sum(opens).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(key.as("key"), col("island"))
      .agg(min(s).as("interval_start"), max(e).as("interval_end"),
        count(lit(1)).as("n_events"))
  }

  /** Exact EWMA with α = 1/2 over the trailing `lookback` points of
    * each key's series, as a bigint (numerator, denominator) pair —
    * weights are powers of two, so both are exact integers and the
    * result is engine- and order-independent. The frame is collected
    * as an array and folded with higher-order functions: no self-join
    * fan-out, O(lookback) state per row. `order` columns must make the
    * per-key order total, and `value` must be NON-NULL: collect_list
    * silently drops NULLs from the frame, which would shift every
    * dyadic weight relative to the documented trailing-points
    * semantics — coalesce or filter NULLs out first. Appends
    * `ewma_num` / `ewma_den`. */
  def ewmaNumDen(df: DataFrame, key: Column, order: Seq[Column],
      value: Column, lookback: Int): DataFrame = {
    require(lookback >= 1 && lookback <= 62,
      "lookback must keep the weight total 2^lookback - 1 in a bigint")
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-(lookback - 1), 0)
    val top = lookback - 1
    // The numerator folds in DECIMAL(38,0): x * 2^61 silently wraps a
    // bigint (non-ANSI) for |x| as small as ~4 at the top weight, with
    // no error. 38 digits hold any frame this operator admits
    // (lookback ≤ 62 ⇒ weighted sum < 2^63 · max|x|, and the checked
    // narrowing below raises if the EXACT value exits bigint range —
    // wraparound becomes a loud error, never a wrong answer).
    df.withColumn("__ewma_arr", collect_list(value).over(w))
      .withColumn("__ewma_num_dec",
        expr(s"""aggregate(
                |  transform(__ewma_arr, (x, i) ->
                |    CAST(x AS DECIMAL(38,0)) *
                |      CAST(shiftleft(1L, $top - (size(__ewma_arr) - 1 - i))
                |           AS DECIMAL(38,0))),
                |  CAST(0 AS DECIMAL(38,0)), (a, v) -> a + v)""".stripMargin))
      .withColumn("ewma_num",
        expr("""CASE WHEN __ewma_num_dec BETWEEN -9223372036854775808
                |         AND 9223372036854775807
                |  THEN CAST(__ewma_num_dec AS BIGINT)
                |  ELSE raise_error(concat('ewma_num overflows bigint: ',
                |         CAST(__ewma_num_dec AS STRING)))
                |END""".stripMargin))
      .withColumn("ewma_den",
        expr(s"""aggregate(
                |  transform(__ewma_arr, (x, i) ->
                |    shiftleft(1L, $top - (size(__ewma_arr) - 1 - i))),
                |  0L, (a, v) -> a + v)""".stripMargin))
      .drop("__ewma_arr", "__ewma_num_dec")
  }
}
