package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The 25-column fact union — UNION ALL of the three branches (ref
  * `Incremental_load_fact_item_status.sql:310-314`; SURVEY.md §2.5 D4).
  *
  * The reference's union is positional; per SURVEY §7.4.6 we assert the
  * branch schemas are identical (names + types, in order) at construction
  * time and use `unionByName` so a column reorder can never silently
  * corrupt the fact.
  *
  * Scale: union is a no-shuffle operator — each branch keeps its own
  * partitioning and the sink coalesces. The three branches share the
  * forex/config dim scans; Catalyst plans each branch independently
  * (dims are broadcast, so re-planning them is cheap — SURVEY §4).
  */
object Fact {

  val columns: Seq[String] = Seq(
    "fact_item_status_key", "status_date_key", "region_key",
    "item_status_key", "line_item_status", "fulfiller_item_status",
    "item_status_id", "current_status", "brand_key", "dc_code",
    "trans_order_id", "user_key", "cart_id", "sku_base_id", "product_key",
    "status_quantity", "status_applied_amount",
    "status_applied_dollar_amount", "status_applied_discount",
    "status_applied_dollar_discount", "cancel_reason_id", "store_number",
    "latest_status", "cdc_timestamp_gcp", "channel_key")

  /** All three branches unioned (ref :310-314). `itemStatusOffset` /
    * `tomfordOffset` are CDC timestamps in lineitem/orders time;
    * `chinaOffset` is in events time (FIXTURES.md §A role mapping). */
  def build(spark: SparkSession, dir: String, itemStatusOffset: String,
      chinaOffset: String, tomfordOffset: String): DataFrame = {
    val b1 = ItemStatus.build(spark, dir, itemStatusOffset)
    val b2 = AggChina.build(spark, dir, chinaOffset)
    val b3 = Tomford.build(spark, dir, tomfordOffset)
    for (b <- Seq(b1, b2, b3)) {
      require(b.columns.toSeq == columns,
        s"branch schema drift: ${b.columns.toSeq.diff(columns)} vs $columns")
      val drift = b.schema.fields.map(f => (f.name, f.dataType))
        .zip(b1.schema.fields.map(f => (f.name, f.dataType)))
        .filter { case (x, y) => x != y }
      require(drift.isEmpty, s"branch type drift: ${drift.mkString(", ")}")
    }
    b1.unionByName(b2).unionByName(b3)
  }
}
