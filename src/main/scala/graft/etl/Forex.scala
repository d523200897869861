package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Functions
import graft.tables.Catalog

/** The latest-currency-rate lookup — the reference's forex CTE chain
  * (ref `Incremental_load_fact_item_status.sql:42-58`, duplicated with a
  * current-month/2-digit-year variant at :116-162; SURVEY.md §2.4 A2).
  *
  * Testdata stand-in (FIXTURES.md §A role mapping): the forex dimension
  * is derived deterministically from `orders` — currency :=
  * o_orderpriority, calendar cells := year/month of o_orderdate, rate :=
  * max(o_totalprice) per cell. `max` over an exact decimal cast keeps
  * the derivation bit-identical in Spark and the DuckDB oracle (no
  * FP-accumulation-order dependence).
  *
  * Scale: the forex dim is tiny (|currencies| × |months|) — every join
  * against it must broadcast; both variants below aggregate the orders
  * scan with map-side partial max, one shuffle on the group keys.
  */
object Forex {

  /** The forex dimension stand-in: (from_currency, cal_year, cal_month,
    * conversion_rate). */
  def base(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.orders(spark, sfDir)
      .groupBy(
        col("o_orderpriority").as("from_currency"),
        year(col("o_orderdate")).as("cal_year"),
        month(col("o_orderdate")).as("cal_month"))
      .agg(max(col("o_totalprice").cast(DecimalType(18, 2))).as("conversion_rate"))

  /** CTE-faithful variant (ref sql:42-58): years = MAX(cal_year) per
    * currency; months = MAX(cal_month) within that year (join-back);
    * latest = (currency, year, month); rate lookup join. Four operators,
    * exactly like the reference — kept for oracle parity and as the
    * shape Catalyst must optimize (it broadcasts every join: each CTE
    * output is ≤ |currencies| rows). */
  def latestCte(spark: SparkSession, sfDir: String): DataFrame = {
    val forex = base(spark, sfDir)
    val years = forex.groupBy(col("from_currency").as("y_currency"))
      .agg(max(col("cal_year")).as("y_year"))
    val months = forex
      .join(broadcast(years),
        col("from_currency") === col("y_currency") && col("cal_year") === col("y_year"))
      .groupBy(col("from_currency").as("m_currency"), col("cal_year").as("m_year"))
      .agg(max(col("cal_month")).as("m_month"))
    forex.join(broadcast(months),
        col("from_currency") === col("m_currency") &&
          col("cal_year") === col("m_year") &&
          col("cal_month") === col("m_month"))
      .select(col("from_currency"), col("cal_year"), col("cal_month"), col("conversion_rate"))
  }

  /** Idiomatic Spark variant: single window argmax (SURVEY §2.4 A2) —
    * one shuffle on from_currency replaces the CTE chain's two
    * aggregations + two joins. Tie-break on conversion_rate desc makes
    * the output a total function of the data (the stand-in derivation
    * guarantees (currency,year,month) is unique, so ties cannot occur,
    * but the order is total regardless). */
  def latestWindow(spark: SparkSession, sfDir: String): DataFrame =
    Functions.latestBy(
      base(spark, sfDir),
      Seq("from_currency"),
      Seq(col("cal_year").desc, col("cal_month").desc, col("conversion_rate").desc))

  /** China-branch variant (ref sql:116-162, quirk at :124): instead of
    * argmax, pin to the "current" month and 2-digit year via
    * FORMAT_DATE('%y', …) — reproduced verbatim per SURVEY §7.4.4,
    * including the int cast of the 2-digit year. `asOf` replaces
    * CURRENT_DATE() for determinism (SURVEY §7.4.2); callers pass a
    * data-derived date. With 4-digit cal_year this matches nothing —
    * exactly the reference's latent behavior — so the stand-in compares
    * against cal_year MOD 100 on the dim side to keep the operator
    * observable. */
  def chinaCurrentMonth(spark: SparkSession, sfDir: String, asOf: String): DataFrame =
    chinaCurrentMonthOn(base(spark, sfDir), to_date(lit(asOf)))

  /** Same variant with the as-of date supplied as a COLUMN — callers can
    * cross-join a broadcast 1-row scalar subquery instead of pulling the
    * date to the driver (saves a driver round trip per build; the
    * all-in-plan form Catalyst can schedule as one job). */
  def chinaCurrentMonthOn(forex: DataFrame, asOfDate: org.apache.spark.sql.Column): DataFrame =
    forex
      .filter(
        col("cal_month") === month(asOfDate) &&
          (col("cal_year") % 100) === Functions.twoDigitYear(asOfDate).cast("int"))
      .groupBy(col("from_currency"), col("conversion_rate"))
      .agg(max(col("cal_year")).as("cal_year"))
      .select(col("from_currency"), col("cal_year"), col("conversion_rate"))
}
