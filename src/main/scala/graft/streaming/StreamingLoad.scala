package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming variant of the incremental ingest (SURVEY.md
  * §2.9): the reference's batch lookback window is exactly an
  * allowed-lateness bound, so the streaming formulation is
  * `withWatermark(lookback)` + key dedup + append sink via foreachBatch.
  *
  * Scale notes: `dropDuplicates` after a watermark keeps state bounded
  * when the dedup keys include the event-time column (or use
  * `dropDuplicatesWithinWatermark`); here the demo key is the unique
  * event_id. The foreachBatch sink is where a production pipeline would
  * run the delete-insert merge of [[graft.etl.IncrementalLoad]] per
  * micro-batch.
  */
object StreamingLoad {

  /** events.parquet physical schema (ts is TIMESTAMP(NANOS), read as
    * raw nanos — same handling as graft.tables.Catalog). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events parquet dir with the engine's nanos
    * handling (the one place the readStream + nanosAsLong +
    * `ts div 1000` truncation recipe lives — the streaming sibling of
    * `Catalog.readEvents`; every stream query starts here). */
  def eventStream(spark: SparkSession, srcDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsRawSchema).parquet(srcDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Stream `srcDir`'s parquet events into `targetPath`, processing all
    * available input (Trigger.AvailableNow), then return. */
  def ingest(spark: SparkSession, srcDir: String, targetPath: String,
      lookback: String = "3 days"): Unit = {
    val stream = eventStream(spark, srcDir)
      .withWatermark("ts", lookback)
      .dropDuplicates("event_id")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    // State partitioning is a stream-lifetime property (fixed into the
    // checkpoint at first start), tuned separately from the batch
    // shuffle width: a handful of dedup state stores per executor core
    // is the production shape; inheriting a wide batch setting just
    // multiplies checkpoint I/O per micro-batch.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val q = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"${targetPath}__checkpoint")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(targetPath); ()
        }
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
  }
}
