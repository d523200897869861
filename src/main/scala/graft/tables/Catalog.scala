package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical table name -> DataFrame over the driver-provisioned parquet
  * testdata (TESTDATA.md). Mirrors the reference's table registry of
  * 3-part templated identifiers (SURVEY.md §2.1 S3; reference
  * `Incremental_load_fact_item_status.sql:20-306` reads 13 distinct
  * tables by name).
  *
  * Scale note: each table is a plain parquet directory/file scan —
  * Catalyst handles column pruning + predicate pushdown at the source.
  * On a real cluster these would be partitioned-by-date fact paths and
  * the delta predicate (SURVEY §2.2 P4) doubles as partition pruning.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(tableNames.contains(name), s"unknown table: $name")
    if (name == "events") readEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos-since-epoch (legacy conf) and truncate to microseconds with
    * integer division — `div` keeps the arithmetic in Long (a double
    * divide would lose precision above 2^53 ns) and matches DuckDB's
    * flooring TIMESTAMP_NS→TIMESTAMP cast, so oracle comparisons agree
    * to the microsecond. */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** SQL front door: register every table as a temp view so
    * `spark.sql(...)` works over the testdata — the surface reference
    * users (a SQL pipeline) actually write against. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n =>
      apply(spark, sfDir, n).createOrReplaceTempView(n))

  def region(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
