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

  /** `events.ts` has shipped in two physical shapes across testdata
    * generations, so the reader adapts to the footer instead of
    * assuming one:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]); read as raw nanos-since-epoch
    *    (legacy conf) and truncate to microseconds with integer `div`
    *    (Long arithmetic — a double divide loses precision above
    *    2^53 ns), matching DuckDB's flooring TIMESTAMP_NS→TIMESTAMP
    *    cast to the microsecond.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ; cast to session-zoned TimestampType (sessions
    *    pin UTC) so every downstream query keeps the type the engine
    *    was written against, and DuckDB's naive read agrees. */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** SQL front door: register every table as a temp view so
    * `spark.sql(...)` works over the testdata — the surface reference
    * users (a SQL pipeline) actually write against. Memoized per
    * (session, sfDir): a production session registers its catalog
    * once, and re-registering 10 views per query re-reads 10 footers
    * for identical definitions; switching sfDir (tests do) re-points
    * every view. */
  private val viewsFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    if (viewsFor.get(spark) != sfDir) {
      tableNames.foreach(n =>
        apply(spark, sfDir, n).createOrReplaceTempView(n))
      viewsFor.put(spark, sfDir)
      ()
    }

  def region(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "documents")

  /** `documents`, REBALANCED for per-row compute-dense pipelines
    * (tokenization, n-gram construction, shingling, chunk embedding):
    * a corpus delivered as few consolidated files — single-row-group
    * parquet exports are common — scans as fewer tasks than cores, so
    * the expensive per-document work serializes on one core while the
    * rest idle. When the scan already splits to at least the session
    * parallelism (the many-files regime every large deployment is in)
    * this is the identity — the exchange exists only where the input
    * layout under-parallelizes, and it moves the narrow projected
    * columns, not the whole row. Cheap projections/aggregations keep
    * using [[documents]]: their scans don't dominate, and several pin
    * zero-exchange plan shapes. */
  def documentsSpread(spark: SparkSession, d: String): DataFrame = {
    val df = documents(spark, d)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
