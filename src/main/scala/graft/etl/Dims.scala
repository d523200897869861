package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Catalog

/** Dimension stand-ins for the reference's star schema (SURVEY.md §2.1 S3;
  * FIXTURES.md §A role mapping). Each dim is either derived
  * deterministically from a driver testdata table or declared as a literal
  * VALUES relation — the identical derivation appears in the DuckDB oracle
  * SQL, so the oracle defines the contract.
  *
  * Scale: every dim here is tiny (≤ 25 rows derived, ≤ 6 rows literal) —
  * exactly the reference's shape (config/brand/region/channel/status dims
  * vs a billions-row fact). All joins against them must broadcast; the
  * branch builders wrap each dim side in `broadcast(...)`.
  */
object Dims {

  /** The 5 currency codes of the forex stand-in (o_orderpriority domain). */
  val currencies: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** CASE mapping n -> currency by `n % 5` (used to give each config row a
    * from-currency; ref `config_brand_region.country_from_curr`, sql:99). */
  def currencyOf(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(array(currencies.map(lit): _*), (n % 5 + 1).cast("int"))

  /** `config_brand_region_tbl` stand-in (ref sql:97-98,249-252; J1, J12):
    * nation -> (dataset, brand_id, country_id, country_from_curr,
    * record_active). Nations with `n_nationkey % 11 == 10` are flagged
    * inactive to exercise the `record_active = 'A'` pins. */
  def configBrandRegion(spark: SparkSession, dir: String): DataFrame =
    Catalog.nation(spark, dir).select(
      col("n_name").as("dataset"),
      col("n_nationkey").cast("bigint").as("brand_id"),
      col("n_regionkey").cast("bigint").as("country_id"),
      currencyOf(col("n_nationkey")).as("country_from_curr"),
      when(col("n_nationkey") % 11 === 10, lit("NA")).otherwise(lit("A"))
        .as("record_active"))

  /** `dim_brand_tbl` stand-in (ref sql:165-168; J9): supplier with the
    * brand code pre-lowercased in the dim CTE, exactly like ref :165. */
  def brandDim(spark: SparkSession, dir: String): DataFrame =
    Catalog.supplier(spark, dir).select(
      lower(col("s_name")).as("brand_code"),
      col("s_suppkey").cast("bigint").as("brand_key"))

  /** `dim_channel_tbl` stand-in (ref sql:253-256; J13): mixed-case names
    * joined case-insensitively. 'error' is deliberately absent so error
    * events exercise the LEFT-join null path. */
  def channelDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("Click", 1L), ("Purchase", 3L), ("SignUp", 4L), ("View", 5L),
      ("Phone", 6L)).toDF("channel_name", "channel_id")
  }

  /** `dim_item_status_tbl` stand-in (ref sql:257-264; J14): names carry
    * digit/paren noise that the double-REGEXP_REPLACE key normalization
    * must strip. 'CANCELLED 01' keeps its inner space after normalization
    * (ref does not trim) so cancelled rows exercise the no-match path —
    * the same latent behavior the reference has. */
  def itemStatusDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("SHIPPED(2)", 10L), ("pending01", 20L), ("Returned(9)3", 30L),
      ("CANCELLED 01", 40L), ("Error", 50L))
      .toDF("item_status_name", "status_id")
  }

  /** `dim_item_cancel_reason_tbl` stand-in (ref sql:306; J15): codes 0-3
    * only, so codes 4-6 on the fact side exercise LEFT-join nulls. */
  def cancelReasonDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0L, "CUSTOMER_REQUEST"), (1L, "OUT_OF_STOCK"), (2L, "FRAUD"),
      (3L, "PRICING_ERROR")).toDF("cancel_code", "cancel_reason")
  }

  /** Latest conversion rate per currency as a broadcastable 5-row lookup
    * (ref sql:42-58 via the window argmax; rate cast to double for stable
    * output — SURVEY decimal-output rule). */
  def forexLatest(spark: SparkSession, dir: String): DataFrame =
    Forex.latestWindow(spark, dir)
      .select(col("from_currency"),
        col("conversion_rate").cast("double").as("conversion_rate"))
}
