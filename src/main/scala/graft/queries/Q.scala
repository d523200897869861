package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (where
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet tables (SURVEY.md §5.1). `oracle = None` →
  * driver records a weaker rows-only check.
  *
  * Contract notes (builder prompt): result column names must match the
  * oracle's exactly (driver sorts columns by name before hashing), and
  * results must be deterministic — no uuid()/current_timestamp() in
  * output, no FP-accumulation-order-dependent values (use decimal casts
  * or max/min/count-style exact aggregates).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
