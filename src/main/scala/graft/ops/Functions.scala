package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function surface of the reference (SURVEY.md §2.6 F1-F20), each
  * mapped to a codegen'd Spark builtin — zero UDFs, zero custom Catalyst
  * (SURVEY §2.10). Kept as thin named aliases so ETL code reads like the
  * reference semantics it implements.
  */
object Functions {

  /** BigQuery SAFE_DIVIDE (ref sql:83,85,210,293,295): NULL on divide by
    * zero or NULL, never throws. Spark's `try_divide` is an exact
    * semantic match and stays inside whole-stage codegen. */
  def safeDivide(a: Column, b: Column): Column = try_divide(a, b)

  /** BigQuery IFNULL (ref sql:17,80,207,274,290). */
  def ifnull(a: Column, b: Column): Column = coalesce(a, b)

  /** The reference's null-tolerant join predicate idiom
    * `CASE WHEN x IS NULL THEN 1 WHEN x = y THEN 1 ELSE 0 END = 1`
    * (ref sql:106-109) — i.e. x IS NULL OR x = y. Note this is NOT
    * `coalesce(x === y, true)`: when x is non-null and y is NULL the
    * reference yields FALSE (falls through to ELSE 0), whereas the
    * coalesce form would yield TRUE. Catalyst's BooleanSimplification
    * keeps the surrounding equi-conjuncts as hash join keys and plans
    * this as a residual filter (SURVEY §4). */
  def nullTolerantEq(x: Column, y: Column): Column =
    x.isNull || (x === y)

  /** BigQuery double REGEXP_REPLACE normalization used by the
    * dim_item_status join key (ref sql:260-262): strip digits, then
    * strip parens+digits runs. */
  def statusNameNormalize(c: Column): Column =
    upper(regexp_replace(regexp_replace(c, "[0-9]", ""), "[\\(\\)\\d]+", ""))

  /** Grouped argmax — "latest record per key" (ref sql:42-58 forex CTE
    * chain; SURVEY §2.4 A2). One window replaces the reference's 4-CTE
    * max-year/max-month/join-back pattern: a single shuffle on the
    * partition keys instead of two aggregations plus two joins.
    * Deterministic: callers must pass a total order (tie-break cols). */
  def latestBy(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** FORMAT_DATE('%y', d) — the reference's 2-digit-year quirk
    * (ref sql:124, SURVEY §7.4.4). Reproduced verbatim, not "fixed". */
  def twoDigitYear(d: Column): Column = date_format(d, "yy")

  /** FORMAT_DATETIME('%Y-%m-%d', dt) || ' 00:00:00' (ref sql:185) —
    * day-truncation rendered as a string. */
  def dayFloorString(dt: Column): Column =
    concat(date_format(dt, "yyyy-MM-dd"), lit(" 00:00:00"))
}
