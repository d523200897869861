package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass data profiling (the deequ-style ingest audit): null
  * counts, distinct counts, and min/max per column, computed in ONE
  * aggregation over ONE scan — a naive per-column loop scans the table
  * once per column, which at 100 TB turns a monitoring query into N
  * full passes. The wide aggregate row then unpivots to one row per
  * column via `stack` (narrow, no shuffle).
  *
  * min/max are computed on the native type (so ordering is numeric for
  * numerics) and cast to string only for the uniform output schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    wide.selectExpr("n_rows",
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_s, max_s)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
