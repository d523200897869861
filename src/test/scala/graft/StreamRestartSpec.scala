package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.ModelInference

/** Crash drill for the streaming INGEST protocol (the q213 shape):
  * kill the query between micro-batches, restart from the checkpoint,
  * and prove exactly-once OUTPUT via the idempotent per-batch sink —
  * foreachBatch is at-least-once by contract (a batch interrupted
  * after its write but before its commit re-runs on restart), so the
  * sink writes mode-overwrite into a batchId-keyed directory: the
  * standard idempotence pattern a production ingest uses. The drill
  * tolerates the stop landing after either batch (stop() races the
  * trigger loop); in every interleaving the reconciled output must
  * equal batch scoring exactly and the commit log must show all
  * waves processed across the two runs. */
class StreamRestartSpec extends SparkSuite {

  test("scored ingest resumes from checkpoint; batchId-keyed sink " +
      "stays exactly-once across the kill") {
    val base = "/tmp/graft_restart_spec"
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)
    val docs = graft.tables.Catalog.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // two arrival waves with pinned mtimes (FileStreamSource orders
    // files oldest-first by mtime; two writes can share a tick)
    def stamp(dir: String, mtime: Long, before: Set[String]): Set[String] = {
      val names = fs.listStatus(new Path(dir)).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_")).map(_.getPath.getName).toSet
      (names -- before).foreach(n =>
        fs.setTimes(new Path(dir, n), mtime, -1))
      names
    }
    val t0 = 1600000000000L
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$base/src")
    val w1 = stamp(s"$base/src", t0, Set.empty)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$base/src")
    stamp(s"$base/src", t0 + 60000L, w1)

    val weights = Array(0L, 500000L, 300000L, 200000L) // frozen model
    val schema = spark.read.parquet(s"$base/src").schema
    def scoredStream(): DataFrame = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      val feats = stream.select(
        col("doc_id") +: graft.queries.TextQueries.clfFeatureCols: _*)
        .select(col("doc_id"),
          array(col("f0"), col("f1"), col("f2"), col("f3")).as("f"))
      ModelInference.score(feats, "f",
        new ModelInference.RationalLogisticScorer(weights), 16)
    }
    def start() = scoredStream().writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // idempotent sink: a re-run of batch `id` overwrites itself
        batch.write.mode("overwrite").parquet(s"$base/out/b$id"); ()
      }
      .start()

    // run 1: kill as soon as the first micro-batch reports progress
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (q1.isActive && q1.recentProgress.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(20)
    q1.stop()
    q1.awaitTermination()
    assert(q1.recentProgress.nonEmpty || !q1.isActive,
      "first run never made progress")

    // run 2: resume from the checkpoint; processes whatever remains
    val q2 = start()
    q2.awaitTermination()

    // all waves processed across the two runs, none twice
    val commits = new java.io.File(s"$base/ckpt/commits")
      .list().count(n => n.forall(_.isDigit))
    assert(commits >= 2, s"expected >= 2 committed batches, got $commits")
    val got = spark.read.parquet(s"$base/out/b*")
      .select(col("doc_id"), col("score_micro"))
    val want = ModelInference.score(
      docs.select(col("doc_id") +: graft.queries.TextQueries.clfFeatureCols: _*)
        .select(col("doc_id"),
          array(col("f0"), col("f1"), col("f2"), col("f3")).as("f")),
      "f", new ModelInference.RationalLogisticScorer(weights), 16)
    assertSameRows(got, want)
  }
}
