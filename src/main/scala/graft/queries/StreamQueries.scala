package graft.queries

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingLoad

/** Structured Streaming coverage beyond ingest (q26), sessionization
  * (q37) and online near-dup (q90-family): the two remaining core
  * streaming shapes — a watermarked STREAM-STREAM interval join and a
  * tumbling-window streaming aggregation. Both run Trigger.AvailableNow
  * over a staged copy of the events table and are verified against the
  * equivalent batch SQL: with all input processed, the streaming result
  * must equal the batch result exactly.
  */
object StreamQueries {

  /** Stage `events.parquet` under a per-query scratch dir and wipe any
    * previous run (rerun-safe, concurrent-sf-safe — same pattern as
    * q26). Returns (srcDir, base). */
  private def stage(s: SparkSession, d: String, tag: String): (String, String) = {
    val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/${tag}_${java.nio.file.Paths.get(d).getFileName}"
    val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)
    val conf = s.sparkContext.hadoopConfiguration
    FileUtil.copy(fs, new Path(s"$d/events.parquet"),
      fs, new Path(s"$base/src/events.parquet"), false, conf)
    (s"$base/src", base)
  }

  private def eventStream(s: SparkSession, srcDir: String): DataFrame =
    StreamingLoad.eventStream(s, srcDir)

  /** Run `body` (a streaming query start→awaitTermination) with the
    * state partitioning pinned to `n`: `spark.sql.shuffle.partitions`
    * at stream START fixes the number of state stores for the query's
    * LIFETIME (it is a checkpoint property, not a per-batch one), so
    * streaming state partitioning is its own tuning decision, separate
    * from the batch shuffle width — a handful of state stores per
    * executor core is the production shape; 32 stores over one
    * micro-batch is pure checkpoint-I/O overhead. Restores the batch
    * setting afterwards. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    // SPARK_GRAFT_STATE_PARTITIONS overrides the per-query pin — the
    // A/B lever StreamProbe uses to attribute the state-store-instance
    // share of the streaming floor (never set in driver/bench runs)
    val eff = sys.env.get("SPARK_GRAFT_STATE_PARTITIONS")
      .map(_.toInt).getOrElse(n)
    s.conf.set(key, eff.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Stage one arrival wave into `srcDir` and re-stamp its NEW part
    * files to `mtime`: FileStreamSource orders files oldest-first by
    * modification time, and two back-to-back writes can land in the
    * same mtime granularity tick — a query whose oracle assumes a wave
    * order must pin it explicitly, not rely on write timing. */
  private def stageWave(fs: FileSystem, srcDir: String, mtime: Long)(
      write: => Unit): Unit = {
    val dir = new Path(srcDir)
    def parts(): Set[String] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_")).map(_.getPath.getName).toSet
    val before = parts()
    write
    (parts() -- before).foreach(n =>
      fs.setTimes(new Path(dir, n), mtime, -1))
  }

  /** q124 — watermarked STREAM-STREAM INTERVAL JOIN: each click joined
    * to the same user's purchases within the following 30 minutes.
    * State stays bounded because BOTH sides carry a watermark and the
    * join condition bounds purchase time relative to click time — Spark
    * derives the state eviction horizon from exactly that pair
    * (clicks older than watermark - 30min can never match again).
    * The oracle is the identical batch interval join. */
  val q124 = Q("q124_stream_stream_join",
    (s, d) => {
      val (src, base) = stage(s, d, "q124")
      val clicks = eventStream(s, src)
        .filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val purchases = eventStream(s, src)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          round(col("value") * 100).cast("bigint").as("purchase_cents"))
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"), col("purchase_cents"))
      // State width 4 (was 8): measured r11, the join's state is ~60k
      // rows in 2 micro-batches — store-instance count (4 stores per
      // partition for a stream-stream join) outweighs parallelism
      // here. RocksDB provider measured +0.65s on the same run shape
      // (per-instance init, no long-run compaction payoff): the
      // HDFS-backed store is right for bounded replays; RocksDB is the
      // long-lived large-state choice. Cold-run attribution (StreamProbe):
      // ~2.6s whole-stage-codegen JIT + ~1.2s incremental planning +
      // ~1.4s data/state/stage-copy — an engine floor for a cold
      // streaming join, not a plan defect (same-JVM rerun: 2.9s).
      withStatePartitions(s, 4) {
        val q = joined.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$base/out"); ()
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$base/out")
    },
    Some(
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       CAST(c.ts AS TIMESTAMP) AS click_ts,
        |       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |       CAST(round(p.value * 100) AS BIGINT) AS purchase_cents
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |  AND CAST(p.ts AS TIMESTAMP)
        |      <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin))

  /** q125 — STREAMING TUMBLING-WINDOW AGGREGATION: daily count + exact
    * cents sum per event type, maintained by the streaming engine and
    * published complete per micro-batch (foreachBatch overwrite — the
    * serving-table pattern). Complete mode is right here because the
    * key space is bounded (days × event types); an unbounded key space
    * would use append mode + watermark and accept that the tail window
    * publishes one trigger late. Tumbling windows are epoch-aligned, so
    * window.start == date_trunc('day') in the UTC session zone — the
    * oracle is the identical batch roll-up. */
  val q125 = Q("q125_stream_window_agg",
    (s, d) => {
      val (src, base) = stage(s, d, "q125")
      val agg = eventStream(s, src)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("bigint")).as("cents_sum"))
        .select(col("window.start").as("day_start"), col("event_type"),
          col("n"), col("cents_sum"))
      withStatePartitions(s, 8) {
        val q = agg.writeStream
          .trigger(Trigger.AvailableNow())
          .outputMode("complete")
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$base/out"); ()
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$base/out")
    },
    Some(
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |         AS day_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents_sum
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** q134 — STREAMING UPSERT PIPELINE, the production composition the
    * [[StreamingLoad]] scaladoc promises: watermarked dedup ingest →
    * per-micro-batch MERGE (anti-join survivors ∪ batch, keyed on
    * event_id) → versioned snapshot publish ([[graft.ops.Snapshots]]),
    * so every micro-batch commits atomically and history stays
    * time-travelable. The target is pre-seeded with STALE rows (every
    * 100th event, cents zeroed) that the stream must overwrite — the
    * oracle equals the fresh events exactly, so a surviving stale row
    * (broken update path) or a duplicate (broken merge key) fails the
    * hash. */
  val q134 = Q("q134_stream_upsert",
    (s, d) => {
      val (src, base) = stage(s, d, "q134")
      val tgtBase = s"$base/target"
      val fresh = (df: DataFrame) => df.select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("bigint").as("cents"))
      // stale seed the upsert must replace
      graft.ops.Snapshots.publish(s, tgtBase,
        fresh(graft.tables.Catalog.events(s, d))
          .filter(col("event_id") % 100 === 0)
          .withColumn("cents", lit(0L)))
      val stream = eventStream(s, src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
      withStatePartitions(s, 8) {
        val q = fresh(stream).writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val cur = graft.ops.Snapshots.asOf(s, tgtBase)
            val merged = cur.join(batch.select(col("event_id")), Seq("event_id"),
                "left_anti")
              .unionByName(batch)
            graft.ops.Snapshots.publish(s, tgtBase, merged)
            ()
          }
          .start()
        q.awaitTermination()
      }
      graft.ops.Snapshots.asOf(s, tgtBase)
    },
    Some(
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |       CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events""".stripMargin))

  /** q156 — STREAMING TOKEN-BUDGET COUNTER: per-source document and
    * BPE-token totals maintained by the streaming engine over a
    * document stream — the live dashboard number a training-data
    * ingest actually watches ("how many tokens has each source
    * contributed so far"). The codegen'd tokenizer expression runs
    * UNCHANGED inside the micro-batch pipeline (tokenization is a
    * narrow map-side transform, so the only stateful operator is the
    * bounded groupBy(source) — |sources| rows of running state).
    * Complete mode + foreachBatch overwrite is the q125 serving-table
    * pattern; with all input processed the counter must equal the
    * batch roll-up exactly. */
  val q156 = Q("q156_stream_token_budget",
    (s, d) => {
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q156_${java.nio.file.Paths.get(d).getFileName}"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      FileUtil.copy(fs, new Path(s"$d/documents.parquet"),
        fs, new Path(s"$base/src/documents.parquet"), false,
        s.sparkContext.hadoopConfiguration)
      val schema = s.read.parquet(s"$base/src").schema
      val docs = s.readStream.schema(schema).parquet(s"$base/src")
      val agg = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.Bpe.tokenCount(col("text")).cast("bigint"))
            .as("bpe_tokens"))
      withStatePartitions(s, 8) {
        val q = agg.writeStream
          .trigger(Trigger.AvailableNow())
          .outputMode("complete")
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(s"$base/out"); ()
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$base/out")
    },
    Some(
      s"""WITH ${graft.ops.Bpe.dtFixtureCte}
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens
         |FROM documents JOIN dt USING (doc_id)
         |GROUP BY 1""".stripMargin))

  /** q187 — STREAMING LM-COUNT MAINTENANCE: the corpus bigram table
    * (q178's LM training statistic) kept fresh by the streaming engine
    * as documents arrive. Distinct from q156's complete-mode dashboard
    * in all three dimensions that matter at scale: the state is
    * VOCABULARY-wide (every bigram key, not |sources| rows), the sink
    * sees UPDATE-mode deltas (only keys whose totals changed in a
    * micro-batch — re-emitting the whole vocabulary per trigger is
    * exactly what complete mode cannot afford at a real vocabulary),
    * and the run genuinely spans MULTIPLE micro-batches
    * (maxFilesPerTrigger=1 over a two-file split), so the ledger
    * reconciliation — last emitted total per key by batch id — is
    * exercised, not vacuous. With all input processed, the reconciled
    * totals must equal the batch bigram counts exactly (top-50 by
    * count, bounded deterministic output).
    *
    * Scale shape: bigram extraction is the same array-local transform
    * as q178 (narrow, no pre-shuffle); the only stateful operator is
    * the keyed count; the ledger append is delta-sized per batch. The
    * batch-id argmax runs over the ledger (updates-sized), never the
    * corpus. */
  val q187 = Q("q187_stream_lm_counts",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q187_${java.nio.file.Paths.get(d).getFileName}"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val docs = graft.tables.Catalog.documents(s, d)
        .select(col("doc_id"), col("text"))
      // two arrival waves -> two micro-batches under maxFilesPerTrigger=1
      docs.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      docs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      val counts = stream
        .select(graft.ops.TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
        .groupBy(col("b.w1"), col("b.w2")).count()
      withStatePartitions(s, 8) {
        val q = counts.writeStream
          .trigger(Trigger.AvailableNow())
          .outputMode("update")
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            batch.withColumn("b", lit(id))
              .write.mode("append").parquet(s"$base/ledger")
            ()
          }
          .start()
        q.awaitTermination()
      }
      // reconcile: the LAST total emitted per key is the current count
      s.read.parquet(s"$base/ledger")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("w1"), col("w2")).orderBy(col("b").desc)))
        .filter(col("rn") === 1)
        .select(col("w1"), col("w2"), col("count").cast("bigint").as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(50)
    },
    Some(
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |bi AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM docs WHERE len(t) >= 2))
        |SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
        |FROM bi GROUP BY 1, 2
        |ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin))

  /** q201 — STREAMING NEAR-DUP DETECTION as a verified protocol query:
    * the [[graft.streaming.StreamingDedup]] MinHash-LSH pipeline
    * (array-side signatures → per-band-bucket flatMapGroupsWithState
    * holding ONE Long per bucket) run over the q19 corpus arriving in
    * two real micro-batches (originals first, shifted near-copies
    * second, maxFilesPerTrigger=1), candidates appended per batch, then
    * the distinct pair set compared to the oracle's CLOSED FORM of the
    * emission semantics: since rows are processed in doc_id order, a
    * bucket's lifetime emissions are exactly the star from its minimum
    * member — (min, d) for every other member d — regardless of batch
    * boundaries. Hash-green proves the streaming state machine
    * reproduces the batch LSH index across a checkpointed multi-batch
    * run.
    *
    * Scale shape: state is one Long per band bucket (what a batch LSH
    * index would persist anyway); every arriving doc is one state
    * lookup — no history re-scan, no growth in emission cost. Wave
    * order does NOT rely on write timing: FileStreamSource orders
    * files oldest-first by mtime, and two sequential writes CAN land
    * in the same mtime granularity tick, so after staging each wave
    * its part files are explicitly re-stamped (t for the originals,
    * t+60 s for the shifted copies) — the processing order the
    * closed-form oracle assumes is pinned, not probabilistic. The
    * closed form itself is also order-robust WITHIN a batch because
    * the processor sorts each bucket's batch rows. */
  val q201 = Q("q201_stream_dedup",
    (s, d) => {
      import s.implicits._
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q201_${java.nio.file.Paths.get(d).getFileName}"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val corpus = DedupQueries.docsNear(s, d)
      val t0 = System.currentTimeMillis()
      stageWave(fs, s"$base/src", t0) {
        corpus.filter(col("doc_id") < 1000000L).coalesce(1)
          .write.mode("append").parquet(s"$base/src")
      }
      stageWave(fs, s"$base/src", t0 + 60000L) {
        corpus.filter(col("doc_id") >= 1000000L).coalesce(1)
          .write.mode("append").parquet(s"$base/src")
      }
      val schema = s.read.parquet(s"$base/src").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
        .as[graft.streaming.StreamingDedup.Doc]
      val cands = graft.streaming.StreamingDedup
        .streamingCandidates(s, stream, 3)
      withStatePartitions(s, 8) {
        val q = cands.toDF().writeStream
          .trigger(Trigger.AvailableNow())
          .outputMode("append")
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$base/out")
            ()
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$base/out")
        .select(col("doc_a"), col("doc_b")).distinct()
    },
    Some(
      s"""WITH ${DedupQueries.uncappedBandsSql(DedupQueries.docsNearSql)},
         |m AS (SELECT bh, doc_id,
         |        min(doc_id) OVER (PARTITION BY bh) AS mn
         |      FROM bands)
         |SELECT DISTINCT mn AS doc_a, doc_id AS doc_b
         |FROM m WHERE doc_id > mn""".stripMargin))

  /** q213 — ONLINE INFERENCE: the batched model seam under
    * INCREMENTAL execution. The quality classifier trains OFFLINE on
    * the full static corpus (q191's trainer — the deploy shape:
    * weights are frozen before serving), then the corpus arrives as a
    * stream in two real micro-batches and every document is scored
    * through [[graft.ops.ModelInference.score]] INSIDE the streaming
    * dataflow — the seam's mapPartitions stage is a stateless
    * streaming operator, so the same physical contract (fixed-size
    * in-partition batches, one model call per batch) holds per
    * micro-batch with no code change. Feature extraction shares
    * [[TextQueries.clfFeatureCols]] with the batch path, so online
    * and offline scoring can never drift; with all waves processed,
    * the appended stream output must equal batch scoring exactly —
    * the oracle is q208's replay, projected to (doc_id, p_micro).
    *
    * Scale shape: stateless end to end — no state stores, no
    * watermark, no shuffle (scan → project → seam → append sink);
    * rerun-safe via the per-query staged source + checkpoint. This is
    * the continuous-curation topology: a corpus firehose scored by a
    * frozen model at ingest, weights updated by re-deploy. */
  val q213 = Q("q213_stream_scored_ingest",
    (s, d) => {
      import graft.ops.ModelInference
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q213_${java.nio.file.Paths.get(d).getFileName}"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val w = TextQueries.clfTrain(TextQueries.clfFeatures(s, d))
      val batchSize = s.conf.get(ModelInference.batchSizeKey,
        ModelInference.defaultBatchSize.toString).toInt
      // two arrival waves -> two micro-batches under maxFilesPerTrigger=1
      val docs = graft.tables.Catalog.documents(s, d)
        .select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      docs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      val feats = stream.select(
        col("doc_id") +: TextQueries.clfFeatureCols: _*)
        .select(col("doc_id"),
          array(col("f0"), col("f1"), col("f2"), col("f3")).as("f"))
      val scored = ModelInference.score(feats, "f",
        new ModelInference.RationalLogisticScorer(w), batchSize)
      val q = scored.writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$base/out"); ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select(col("doc_id"), col("score_micro").as("p_micro"))
    },
    Some(
      s"""WITH ${TextQueries.clfCtes}
         |SELECT doc_id, p_micro FROM scores""".stripMargin))

  val all: Seq[Q] = Seq(q124, q125, q134, q156, q187, q201, q213)
}
