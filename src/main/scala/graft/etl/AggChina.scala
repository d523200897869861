package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Functions
import graft.tables.Catalog

/** Branch 2 of the fact build — AGG_CHINA (ref
  * `Incremental_load_fact_item_status.sql:114-269`; SURVEY.md §2.3 J8-J14,
  * §2.5 D3). Fact source = `events` (FIXTURES.md §A role mapping); the
  * branch reproduces the reference's structure:
  *
  *  - pre-join dedup CTE (`dedup_operation`, D3)               ref :171-188
  *    with the day-floor string idiom F11 (FORMAT_DATETIME + ' 00:00:00')
  *    ref :185 and the distinct-init D2                        ref :192
  *  - J8 × china forex via a CONSTANT predicate (1-row lookup) ref :232-235
  *    — the rate comes from the 2-digit-year/current-month forex variant
  *    (F10 quirk, ref :116-162, reproduced in [[Forex.chinaCurrentMonth]])
  *  - J9 × brand on the PRE-LOWERCASED dim code                ref :236-239
  *  - J10 × product with a dim-side constant pin               ref :240-244
  *  - J11 × region pinned to one key (1-row lookup)            ref :245-248
  *  - J12 × config on brand + constant country/active pins     ref :249-252
  *  - J13 × channel case-insensitively (UPPER = UPPER)         ref :253-256
  *  - J14 × item-status via double-REGEXP_REPLACE name normalization
  *    ref :257-264
  *  - final equality/inequality filters (P5)                   ref :265-267
  *
  * `GENERATE_UUID()` (ref :193, F15) is replaced by a deterministic md5
  * surrogate of the natural key (SURVEY §7.4.2), and `CURRENT_DATE()`
  * (ref :124, F7/F8) by a data-derived as-of date, so the branch is
  * verifiable against the DuckDB oracle.
  *
  * Scale: the dedup distinct is the branch's one fact-sized shuffle;
  * every join is a broadcast of a tiny dim (J8/J11 are literally 1-row).
  */
object AggChina {

  def build(spark: SparkSession, dir: String, offset: String): DataFrame = {
    // dedup_operation (D3, ref :171-188): distinct over the chosen columns
    // of the delta-filtered source, with the F11 day-floor string.
    val dedup = Catalog.events(spark, dir)
      .filter(col("ts") >= lit(offset).cast("timestamp"))
      .select(
        col("user_id"), col("event_type"),
        Functions.dayFloorString(col("ts")).as("status_date_str"),
        col("value"))
      .distinct()

    val prSa = dedup
      .withColumn("elc_brand_code",
        concat(lit("Supplier#00000000"), (col("user_id") % 10).cast("string")))
      .withColumn("internal_code",
        when(col("event_type") === "purchase", "shipped")
          .when(col("event_type") === "click", "pending")
          .when(col("event_type") === "view", "returned")
          .when(col("event_type") === "signup", "cancelled")
          .otherwise("error"))
      .withColumn("sku", (col("user_id") * 13) % 2000)

    // china forex variant (ref :116-162): current-month + 2-digit-year
    // pin, as-of derived from the data for determinism (SURVEY §7.4.2).
    // The as-of scalar stays IN the plan (broadcast 1-row cross join)
    // instead of a driver .first() round trip.
    val asOfDf = Catalog.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("asof_d"))
    val cf = Forex.chinaCurrentMonthOn(
        Forex.base(spark, dir).crossJoin(broadcast(asOfDf)), col("asof_d"))
      .filter(col("from_currency") === "1-URGENT") // J8 constant pred (ref :235 'CNY')
      .select(col("conversion_rate").cast("double").as("conversion_rate"))

    val br = Dims.brandDim(spark, dir)
    val pt = Catalog.part(spark, dir)
    val rg = Catalog.region(spark, dir)
    val rcb = Dims.configBrandRegion(spark, dir)
    val ch = Dims.channelDim(spark)
    val ist = Dims.itemStatusDim(spark)

    val joined = prSa
      .join(broadcast(cf), lit(true), "left") // J8: constant-pred 1-row lookup
      .join(broadcast(br),
        br("brand_code") === lower(prSa("elc_brand_code")), "left") // J9
      .join(broadcast(pt),
        pt("p_partkey") === prSa("sku") && pt("p_type") === "STANDARD",
        "left") // J10: dim-side constant pin
      .join(broadcast(rg), rg("r_regionkey") === 2, "left") // J11: 1-row lookup
      .join(broadcast(rcb),
        rcb("brand_id") === prSa("user_id") % 25 &&
          rcb("country_id") === 2 && rcb("record_active") === "A",
        "left") // J12
      .join(broadcast(ch),
        upper(ch("channel_name")) === upper(prSa("event_type")), "left") // J13
      .join(broadcast(ist),
        Functions.statusNameNormalize(ist("item_status_name")) ===
          upper(col("internal_code")), "left") // J14
      .filter(col("internal_code") =!= "error" && col("value").isNotNull) // P5

    joined.select(
      // value joins the surrogate as exact cents (doubles never enter a
      // concat: engine-dependent float formatting would break the oracle)
      md5(concat(col("user_id").cast("string"), lit("|"), col("event_type"),
        lit("|"), col("status_date_str"), lit("|"),
        round(col("value") * 100).cast("bigint").cast("string")))
        .as("fact_item_status_key"),
      to_timestamp(col("status_date_str")).cast("timestamp_ntz")
        .as("status_date_key"), // F16; NTZ to match the parquet fact branches
      col("r_regionkey").cast("bigint").as("region_key"),
      coalesce(concat(lit("ST-"), col("status_id").cast("string")),
        lit("ST-NA")).as("item_status_key"), // F3
      col("internal_code").as("line_item_status"),
      upper(col("event_type")).as("fulfiller_item_status"),
      col("status_id").cast("bigint").as("item_status_id"),
      when(col("internal_code") === "shipped", 1L).otherwise(0L)
        .as("current_status"),
      col("brand_key").cast("bigint").as("brand_key"),
      lit(0L).as("dc_code"),
      col("user_id").cast("bigint").as("trans_order_id"),
      col("user_id").cast("bigint").as("user_key"),
      lit(99999L).as("cart_id"),
      col("sku").cast("bigint").as("sku_base_id"),
      coalesce(concat(lit("P-"), col("p_partkey").cast("string")),
        lit("UNKNOWN")).as("product_key"),
      lit(1.0).as("status_quantity"),
      col("value").as("status_applied_amount"),
      Functions.safeDivide(col("value"), col("conversion_rate"))
        .as("status_applied_dollar_amount"),
      lit(0.0).as("status_applied_discount"),
      Functions.safeDivide(col("value") * 0.1, col("conversion_rate"))
        .as("status_applied_dollar_discount"),
      lit(null).cast("bigint").as("cancel_reason_id"),
      lit("0").as("store_number"),
      lit("Y").as("latest_status"),
      to_timestamp(col("status_date_str")).cast("timestamp_ntz")
        .as("cdc_timestamp_gcp"),
      coalesce(col("channel_id"), lit(0L)).cast("bigint").as("channel_key")
    ).distinct()
  }
}
