package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Functions
import graft.tables.Catalog

/** Branch 1 of the fact build — ITEM_STATUS (ref
  * `Incremental_load_fact_item_status.sql:60-112`; SURVEY.md §2.3 J1-J4,
  * §2.2 P3-P5). Fact = `lineitem` with `l_shipdate` as the CDC timestamp
  * (FIXTURES.md §A role mapping); dims per [[Dims]].
  *
  * Join topology (mirrors the reference exactly):
  *  - J1 fact × config on dataset (INNER, broadcast)         ref :97-98
  *  - J2 × latest forex on config currency (INNER, broadcast) ref :99-100
  *  - J3 × orders on order key PLUS null-tolerant region/brand predicates
  *    (`CASE WHEN x IS NULL THEN 1 … END = 1` ≡ coalesce(x===y, true))
  *    and `upper(record_active) <> 'NA'` (INNER)              ref :101-109
  *  - J4 × part LEFT with a dim-side pin (p_size >= 10) so small parts
  *    exercise the null product path                          ref :110-111
  *
  * Scale: J1/J2/J4 broadcast (dims are tiny); J3 is the only shuffle-worthy
  * join (fact × orders on the order key) — Catalyst extracts the equi key
  * for the hash join and keeps the null-tolerant predicates as residual
  * filters (verify in explain; SURVEY §4). The delta filter (P4) lands on
  * the parquet scan as a pushed predicate and doubles as partition pruning
  * when the fact is date-partitioned at scale.
  */
object ItemStatus {

  /** deterministic null injection: every 7th order's status date is null
    * (drives the CASE date-fallback, ref :64-67), every 13th/17th order
    * has null region/brand (drives the null-tolerant join preds :106-109),
    * every 97th order has a zero divisor (drives SAFE_DIVIDE null :83). */
  def build(spark: SparkSession, dir: String, offset: String): DataFrame = {
    val a = Catalog.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(offset).cast("timestamp"))
      .withColumn("dataset",
        concat(lit("NATION_"), (col("l_suppkey") % 25).cast("string")))
      .withColumn("status_date",
        when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_shipdate")))

    val rcb = Dims.configBrandRegion(spark, dir)

    val fx = Dims.forexLatest(spark, dir)

    val t = Catalog.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      when(col("o_orderkey") % 13 === 0, lit(null))
        .otherwise(col("o_custkey") % 5).as("region_id"),
      when(col("o_orderkey") % 17 === 0, lit(null))
        .otherwise(col("o_custkey") % 25).as("brand_id"),
      when(col("o_orderstatus") === "P", lit("na")).otherwise(lit("A"))
        .as("record_active"))

    val pt = Catalog.part(spark, dir)

    val joined = a
      .join(broadcast(rcb), rcb("dataset") === a("dataset"), "inner")
      .join(broadcast(fx), fx("from_currency") === rcb("country_from_curr"), "inner")
      .join(t,
        t("o_orderkey") === a("l_orderkey") &&
          Functions.nullTolerantEq(t("region_id"), rcb("country_id")) &&
          Functions.nullTolerantEq(t("brand_id"), rcb("brand_id")) &&
          upper(t("record_active")) =!= "NA",
        "inner")
      .join(broadcast(pt),
        a("l_partkey") === pt("p_partkey") && pt("p_size") >= 10, "left")

    val divisor = when(col("l_orderkey") % 97 === 0, lit(0.0))
      .otherwise(col("conversion_rate"))

    joined.select(
      // (orderkey, linenumber, partkey, suppkey) is the minimal unique key
      // of the synthetic lineitem — the concat keeps the reference's
      // row-identity invariant (ref sql:341) checkable.
      concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"), lit("|"),
        col("l_partkey").cast("string"), lit("|"),
        col("l_suppkey").cast("string"), lit("|"), a("dataset"))
        .as("fact_item_status_key"),
      when(rcb("country_id").isin(0, 1),
        coalesce(col("status_date"), col("o_orderdate")))
        .otherwise(col("status_date")).as("status_date_key"),
      rcb("country_id").cast("bigint").as("region_key"),
      concat(col("l_returnflag"), lit("-"), col("l_linestatus"))
        .as("item_status_key"),
      col("l_linestatus").as("line_item_status"),
      col("l_returnflag").as("fulfiller_item_status"),
      col("l_linenumber").cast("bigint").as("item_status_id"),
      when(col("l_linestatus") === "O", 1L).otherwise(0L).as("current_status"),
      rcb("brand_id").cast("bigint").as("brand_key"),
      lit(0L).as("dc_code"),
      col("l_orderkey").cast("bigint").as("trans_order_id"),
      col("o_custkey").cast("bigint").as("user_key"),
      (col("l_orderkey") % 1000).cast("bigint").as("cart_id"),
      col("l_partkey").cast("bigint").as("sku_base_id"),
      coalesce(concat(lit("P-"), col("p_partkey").cast("string")),
        lit("UNKNOWN")).as("product_key"),
      col("l_quantity").as("status_quantity"),
      col("l_extendedprice").as("status_applied_amount"),
      Functions.safeDivide(col("l_extendedprice"), divisor)
        .as("status_applied_dollar_amount"),
      col("l_discount").as("status_applied_discount"),
      Functions.safeDivide(col("l_extendedprice") * col("l_discount"), divisor)
        .as("status_applied_dollar_discount"),
      lit(null).cast("bigint").as("cancel_reason_id"),
      lit("0").as("store_number"),
      when(col("l_linestatus") === "O", "Y").otherwise("N").as("latest_status"),
      col("l_shipdate").as("cdc_timestamp_gcp"),
      (when(rcb("brand_id") % 3 === 0, 1L)
        .when(rcb("brand_id") % 3 === 1, 2L)
        .otherwise(3L)).as("channel_key")
    ).distinct()
  }
}
