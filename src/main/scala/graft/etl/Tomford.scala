package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Functions
import graft.tables.Catalog

/** Branch 3 of the fact build — TOMFORD_STATUS (ref
  * `Incremental_load_fact_item_status.sql:271-308`; SURVEY.md §2.3 J15).
  * Fact source = `orders` with `o_orderdate` as the CDC timestamp.
  *
  * Join set (ref :301-306): config INNER on brand+region, forex INNER on
  * currency, item-status LEFT on the normalized name, product LEFT, and
  * cancel-reason LEFT on code (codes 4-6 have no dim row → null reason).
  * Projection carries the reference's literal/dummy columns
  * (`99999 as cart_id` :288, `'' store_number` :297) and the
  * dc_code-by-country-and-status CASE (:282-285).
  */
object Tomford {

  def build(spark: SparkSession, dir: String, offset: String): DataFrame = {
    val src = Catalog.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(offset).cast("timestamp"))
      .withColumn("status_code",
        when(col("o_orderstatus") === "O", "pending")
          .when(col("o_orderstatus") === "F", "shipped")
          .otherwise("cancelled"))

    val rcb = Dims.configBrandRegion(spark, dir)
    val fx = Dims.forexLatest(spark, dir)
    val ist = Dims.itemStatusDim(spark)
    val pt = Catalog.part(spark, dir)
    val cr = Dims.cancelReasonDim(spark)

    val joined = src
      .join(broadcast(rcb),
        rcb("brand_id") === src("o_custkey") % 25 &&
          rcb("country_id") === src("o_custkey") % 5, "inner") // J15 config
      .join(broadcast(fx),
        fx("from_currency") === src("o_orderpriority"), "inner") // J15 forex
      .join(broadcast(ist),
        Functions.statusNameNormalize(ist("item_status_name")) ===
          upper(src("status_code")), "left") // J15 item status
      .join(broadcast(pt),
        pt("p_partkey") === src("o_orderkey") % 2000, "left") // J15 product
      .join(broadcast(cr),
        cr("cancel_code") === src("o_orderkey") % 7, "left") // J15 cancel reason

    joined.select(
      concat(lit("TF|"), col("o_orderkey").cast("string")).as("fact_item_status_key"),
      col("o_orderdate").as("status_date_key"),
      rcb("country_id").cast("bigint").as("region_key"),
      concat(col("o_orderstatus"), lit("-TF")).as("item_status_key"),
      col("status_code").as("line_item_status"),
      col("o_orderstatus").as("fulfiller_item_status"),
      col("status_id").cast("bigint").as("item_status_id"),
      when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("current_status"),
      rcb("brand_id").cast("bigint").as("brand_key"),
      (when(rcb("country_id") === 2 && col("o_orderstatus") === "F", 7L)
        .when(rcb("country_id") === 2, 3L)
        .otherwise(0L)).as("dc_code"), // ref :282-285
      col("o_orderkey").cast("bigint").as("trans_order_id"),
      col("o_custkey").cast("bigint").as("user_key"),
      lit(99999L).as("cart_id"), // ref :288
      (col("o_orderkey") % 2000).cast("bigint").as("sku_base_id"),
      coalesce(concat(lit("P-"), col("p_partkey").cast("string")),
        lit("UNKNOWN")).as("product_key"),
      lit(1.0).as("status_quantity"),
      col("o_totalprice").as("status_applied_amount"),
      Functions.safeDivide(col("o_totalprice"), col("conversion_rate"))
        .as("status_applied_dollar_amount"),
      lit(0.0).as("status_applied_discount"),
      Functions.safeDivide(col("o_totalprice") * 0.05, col("conversion_rate"))
        .as("status_applied_dollar_discount"),
      (col("o_orderkey") % 7).cast("bigint").as("cancel_reason_id"),
      lit("").as("store_number"), // ref :297
      when(col("o_orderstatus") === "O", "Y").otherwise("N").as("latest_status"),
      col("o_orderdate").as("cdc_timestamp_gcp"),
      coalesce(
        when(col("cancel_reason") === "FRAUD", 9L),
        lit(4L)).cast("bigint").as("channel_key")
    ).distinct()
  }
}
