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

  /** Streaming read of an events parquet dir, adapting `ts` the same
    * way as `Catalog.readEvents` (the streaming sibling; every stream
    * query starts here). readStream needs a declared schema, so the
    * footer is probed with a one-off batch read of the same dir —
    * driver-side metadata only, no data scan — and the physical `ts`
    * type picks the normalization:
    *  - LongType (TIMESTAMP(NANOS) under nanosAsLong): `ts div 1000`
    *    truncation to microseconds, Long arithmetic;
    *  - TIMESTAMP_NTZ (TIMESTAMP(MICROS)): cast to session-zoned
    *    TimestampType (sessions pin UTC). */
  def eventStream(spark: SparkSession, srcDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The probe needs at least one footer; a stream started against a
    // not-yet-populated source dir falls back to the known micros
    // shape (the generation current testdata ships) instead of dying
    // with "unable to infer schema".
    val physical =
      try spark.read.parquet(srcDir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException => StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType),
          StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType),
          StructField("props", StringType)))
      }
    val raw = spark.readStream.schema(physical).parquet(srcDir)
    physical("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
