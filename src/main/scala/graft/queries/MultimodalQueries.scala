package graft.queries

import graft.ops.Multimodal
import graft.tables.Catalog

/** Multimodal plumbing as a verifiable query: the binary payload ride,
  * batched mapPartitions decode (stubbed — see [[graft.ops.Multimodal]]),
  * and typed feature output. The oracle recomputes the stub's
  * deterministic fakes in SQL over the same text bytes.
  */
object MultimodalQueries {

  val q25 = Q("q25_multimodal_features",
    (s, d) => Multimodal.decodeFeatures(s,
      Multimodal.mediaFromDocuments(Catalog.documents(s, d))).toDF(),
    Some(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(strlen(text) % 640 AS BIGINT) AS width,
        |  CAST(strlen(text) % 480 AS BIGINT) AS height,
        |  concat_ws(' ', toks[1], toks[11], toks[21], toks[31]) AS frame_sample
        |FROM (SELECT *, regexp_split_to_array(text, '\s+') AS toks
        |      FROM documents)""".stripMargin))

  /** q133 — the RESIZE stage as a verifiable query, now REAL per-pixel
    * work end to end: each doc_id keys a genuine PNG payload
    * (closed-form pixels, [[graft.ops.Multimodal.syntheticPng]]), the
    * stage ImageIO-decodes it, nearest-neighbor-resamples to fit an
    * 8-px budget with exact integer coordinate math, emits the raw RGB
    * tensor's true dims + an order-pinned byte checksum — and the
    * oracle REPLAYS the entire decode→resample→tensorize arithmetic
    * from the closed-form pixel function (per-pixel unnest, summed
    * position-weighted contributions). A checksum match proves every
    * byte of every resized tensor, not just size bookkeeping; the
    * byte-budget stride stage ([[graft.ops.Multimodal.stubResize]])
    * remains for non-image payload budgeting and its own spec.
    *
    * Scale shape: build + decode + resize are all scan-local batched
    * mapPartitions (zero shuffles before the output) — the per-pixel
    * loop is the real cost a 100 TB media pipeline pays, riding the
    * partition-bounded batch contract. */
  /** The synthetic-PNG media corpus as STORED state: a production
    * media pipeline reads payloads from storage — it does not
    * re-encode its input corpus per query — so the PNG build runs once
    * per documents generation behind a stamped fixture
    * ([[graft.ops.Fixtures]]); the timed query is the read → decode →
    * resample → tensorize dataflow. */
  private[graft] def mediaStore(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val store = s"${graft.ops.Fixtures.root(s)}/media_png_" +
      graft.ops.Fixtures.pathKey(d)
    val stamp =
      graft.ops.Fixtures.datasetStamp(s, s"$d/documents.parquet") +
        s"|algo=${Multimodal.mediaAlgoVersion}|fmt=1"
    graft.ops.Fixtures.ensure(s, store, stamp) { stg =>
      Multimodal.syntheticImageMedia(s, Catalog.documents(s, d))
        .write.mode("overwrite").parquet(stg)
    }
    s.read.parquet(store)
  }

  val q133 = Q("q133_multimodal_resize",
    (s, d) => Multimodal.resizeImages(s, mediaStore(s, d), 8).toDF(),
    Some(
      """WITH d3 AS (
        |  SELECT doc_id AS id, sw, sh,
        |    CASE WHEN greatest(sw, sh) <= 8 THEN sw
        |         ELSE greatest(1, sw * 8 // greatest(sw, sh)) END AS w,
        |    CASE WHEN greatest(sw, sh) <= 8 THEN sh
        |         ELSE greatest(1, sh * 8 // greatest(sw, sh)) END AS h
        |  FROM (SELECT doc_id, 8 + doc_id % 13 AS sw, 8 + doc_id % 7 AS sh
        |        FROM documents)),
        |px AS (
        |  SELECT id, w, h,
        |    x * sw // w AS sx, y * sh // h AS sy, (y * w + x) * 3 AS o
        |  FROM d3,
        |    LATERAL unnest(generate_series(0, h - 1)) AS ty(y),
        |    LATERAL unnest(generate_series(0, w - 1)) AS tx(x))
        |SELECT id AS media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(((id * 31 + sx * 7 + sy * 3) % 256) * (o % 97 + 1)
        |    + ((sx * 5 + sy * 11 + 1) % 256) * ((o + 1) % 97 + 1)
        |    + ((id + sx + sy * 13) % 256) * ((o + 2) % 97 + 1))
        |    AS BIGINT) AS checksum
        |FROM px GROUP BY 1, 2, 3, 4""".stripMargin))

  /** q210 — IMAGE NEAR-DUP RETRIEVAL through the model seam (the
    * CLIP-shaped capstone: q133's decode→resize tensors →
    * [[graft.ops.ModelInference.embedImages]] → a STORED bucketed ANN
    * index → per-query best match):
    *
    *  - the INDEX is pre-existing state ([[graft.ops.Fixtures]], like
    *    every stored index here): corpus PNGs → per-pixel resize →
    *    batched image-model embed → 8-bit sign bucket, one stamped
    *    build per documents generation;
    *  - the TIMED query is the serving path: a sampled query batch of
    *    raw PNG payloads runs decode→resize→embedBatch LIVE (the
    *    scan-local batched seam — q186's contract on media rows), then
    *    probes the index by bucket (never corpus × queries) and
    *    exact-reranks to each query's best non-self match.
    *
    * The oracle replays decode→resize→embed→bucket→probe end-to-end
    * from the closed-form pixel formulas — hash-green pins the whole
    * media-to-retrieval pipeline, including every resized byte's
    * contribution to every embedding dim.
    *
    * Scale shape (100 TB): embed is partition-local batched compute;
    * the index probe is one equi join on the bucket key (the IVF cell
    * pattern — at scale the index is partitioned by bucket, so the
    * probe doubles as partition pruning); rerank is per-query
    * window-bounded. */
  private val embDim = 16
  private val bucketBits = 8
  private val maxDim = 8

  private def bucketCol(embC: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{lit, when}
    (0 until bucketBits).map(k =>
      when(embC.getItem(k) > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** decode→resize→embed→bucket for media rows — the shared encode
    * stage of the image family (q210's index build AND serving path,
    * q214's streaming ingest), all stateless batched mapPartitions +
    * expressions, so it drops into a streaming dataflow unchanged. */
  private[graft] def encodeMedia(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val model = new graft.ops.ModelInference.PixelProjectionEmbedder(embDim)
    val batch = s.conf.get(graft.ops.ModelInference.batchSizeKey,
      graft.ops.ModelInference.defaultBatchSize.toString).toInt
    graft.ops.ModelInference.embedImages(
      Multimodal.resizeTensors(s, media, maxDim).toDF(),
      "tensor", model, batch)
      .select(col("media_id"),
        col("emb").as("e"),
        aggregate(transform(col("emb"), x => x * x), lit(0L),
          (acc, x) => acc + x).as("nrm"))
      .withColumn("bucket", bucketCol(col("e")))
  }

  /** The shared oracle prefix of the image family: closed-form pixels
    * → resized per-pixel contributions → per-dim projection sums (the
    * [[graft.ops.ModelInference.PixelProjectionEmbedder]] matrix
    * verbatim: channel c's byte offset is o + c, its weight
    * ((o + c + 1)(k + 7)) mod 23 − 11) → norm + sign bucket. Ends at
    * the `ev(id, e, nrm, bucket)` relation both q210 (probe + rerank)
    * and q214 (streaming ingest assignment) consume. */
  private def mediaEvCtes: String = {
    def dimSum(k: Int): String =
      s"""CAST(sum(
         |  ((id * 31 + sx * 7 + sy * 3) % 256)
         |    * (((o + 1) * ${k + 7}) % 23 - 11)
         |  + ((sx * 5 + sy * 11 + 1) % 256)
         |    * (((o + 2) * ${k + 7}) % 23 - 11)
         |  + ((id + sx + sy * 13) % 256)
         |    * (((o + 3) * ${k + 7}) % 23 - 11)) AS BIGINT)""".stripMargin
    val embCols = (1 to embDim).map(k => s"${dimSum(k)} AS e$k")
      .mkString(",\n")
    val eList = (1 to embDim).map(k => s"e$k").mkString("[", ", ", "]")
    val bucketSql = (1 to bucketBits).map(k =>
      s"CASE WHEN e[$k] > 0 THEN ${1L << (k - 1)} ELSE 0 END")
      .mkString(" + ")
    s"""d3 AS (
       |  SELECT doc_id AS id, sw, sh,
       |    CASE WHEN greatest(sw, sh) <= $maxDim THEN sw
       |         ELSE greatest(1, sw * $maxDim // greatest(sw, sh))
       |         END AS w,
       |    CASE WHEN greatest(sw, sh) <= $maxDim THEN sh
       |         ELSE greatest(1, sh * $maxDim // greatest(sw, sh))
       |         END AS h
       |  FROM (SELECT doc_id, 8 + doc_id % 13 AS sw,
       |               8 + doc_id % 7 AS sh FROM documents)),
       |px AS (
       |  SELECT id, x * sw // w AS sx, y * sh // h AS sy,
       |         (y * w + x) * 3 AS o
       |  FROM d3,
       |    LATERAL unnest(generate_series(0, h - 1)) AS ty(y),
       |    LATERAL unnest(generate_series(0, w - 1)) AS tx(x)),
       |emb AS MATERIALIZED (
       |  SELECT id, $embCols
       |  FROM px GROUP BY id),
       |ev AS MATERIALIZED (
       |  SELECT id, e,
       |    list_aggregate(list_transform(e, x -> x * x), 'sum') AS nrm,
       |    $bucketSql AS bucket
       |  FROM (SELECT id, $eList AS e FROM emb))""".stripMargin
  }

  val q210 = {
    val queryMod = 101L
    Q("q210_image_neardup_ann",
      (s, d) => {
        import org.apache.spark.sql.functions._
        def encode(media: org.apache.spark.sql.DataFrame) =
          encodeMedia(s, media)
        // stored image-ANN index: one stamped build per generation
        val idx = s"${graft.ops.Fixtures.root(s)}/image_ann_" +
          graft.ops.Fixtures.pathKey(d)
        val stamp =
          graft.ops.Fixtures.datasetStamp(s, s"$d/documents.parquet") +
            s"|media=${Multimodal.mediaAlgoVersion}" +
            s"|emb=${graft.ops.ModelInference.imageEmbedAlgoVersion}" +
            s"|dim=$embDim|bits=$bucketBits|maxdim=$maxDim|fmt=1"
        graft.ops.Fixtures.ensure(s, idx, stamp) { stg =>
          encode(mediaStore(s, d)).write.mode("overwrite").parquet(stg)
        }
        val index = s.read.parquet(idx)
        // serving path: live decode→resize→embed of the query batch
        val queries = encode(
            mediaStore(s, d).filter(col("media_id") % queryMod === 0))
          .select(col("media_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qnrm"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("match_id"))
        queries.join(index, "bucket")
          .filter(col("media_id") =!= col("query_id"))
          .select(col("query_id"), col("media_id").as("match_id"),
            (aggregate(zip_with(col("qe"), col("e"), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).cast("double")
              / sqrt(greatest(col("qnrm"), lit(1L)).cast("double")
                * greatest(col("nrm"), lit(1L)).cast("double")))
              .as("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("match_id"), col("cosine"))
      },
      Some {
        s"""WITH $mediaEvCtes,
           |hits AS (
           |  SELECT q.id AS query_id, c.id AS match_id,
           |    CAST(list_aggregate(list_transform(
           |        generate_series(1, $embDim), i -> q.e[i] * c.e[i]),
           |        'sum') AS DOUBLE)
           |      / sqrt(CAST(greatest(q.nrm, 1) AS DOUBLE)
           |             * CAST(greatest(c.nrm, 1) AS DOUBLE)) AS cosine
           |  FROM ev q JOIN ev c ON q.bucket = c.bucket
           |  WHERE q.id % $queryMod = 0 AND c.id <> q.id)
           |SELECT query_id, match_id, cosine FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, match_id) AS rn
           |  FROM hits)
           |WHERE rn = 1""".stripMargin
      })
  }

  /** q214 — STREAMING MEDIA INGEST: the image encode stage (q210's
    * decode→resize→embed→sign-bucket, [[encodeMedia]]) run as a
    * STATELESS STREAMING OPERATOR — PNG payloads arrive in two real
    * micro-batches and every image is embedded and index-bucket-
    * assigned AT INGEST (the continuous media-curation topology: the
    * stored ANN index of q210 grows by exactly these assignments).
    * q213 proved the text seam under incremental execution; this is
    * the media face — batched typed mapPartitions (decode + embed)
    * per micro-batch, zero state stores, zero shuffles, append sink.
    * The oracle replays closed-form pixels → projection → bucket for
    * every payload; hash-green pins every ingested image's embedding
    * norm and bucket across the batch boundaries.
    *
    * Scale shape: identical to the batch encode (scan-local batched
    * compute); at scale the sink appends straight into the
    * bucket-partitioned index layout, so ingest doubles as index
    * maintenance with no rebuild. */
  val q214 = Q("q214_stream_media_ingest",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q214_${java.nio.file.Paths.get(d).getFileName}"
      val fs = org.apache.hadoop.fs.FileSystem
        .get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val media = mediaStore(s, d)
      // two arrival waves -> two micro-batches (maxFilesPerTrigger=1)
      media.filter(col("media_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      media.filter(col("media_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      val assigned = encodeMedia(s, stream)
        .select(col("media_id"), col("bucket"), col("nrm"))
      val q = assigned.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$base/out"); ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/out")
    },
    Some(
      s"""WITH $mediaEvCtes
         |SELECT id AS media_id, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(nrm AS BIGINT) AS nrm
         |FROM ev""".stripMargin))

  /** q215 — AUDIO NEAR-DUP RETRIEVAL through the model seam: the media
    * triad's audio face completed end to end, mirroring q210's
    * composition exactly — a REAL RIFF/WAVE corpus (closed-form PCM
    * samples, [[graft.ops.Multimodal.syntheticWav]]) → genuine
    * container decode ([[graft.ops.Multimodal.decodeWaves]]) →
    * [[graft.ops.ModelInference.embedAudio]] (deterministic
    * `WaveProjectionEmbedder`) → a STORED sign-bucket ANN index
    * (stamped fixture) → live query-batch decode+embed + bucket probe
    * + exact cosine rerank to each query's best non-self match.
    *
    * The oracle replays decode→embed→bucket→probe end-to-end from the
    * closed-form sample formula — hash-green pins every sample's
    * contribution to every embedding dim, the whole audio-to-retrieval
    * pipeline.
    *
    * Scale shape (100 TB): identical to q210 — embed is scan-local
    * batched compute, the probe is one equi join on the bucket key
    * (bucket-partitioned index layout at scale), rerank is per-query
    * window-bounded; never corpus × queries. */
  private val audioEmbDim = 16

  /** decode→embed→bucket for audio media rows — q210's [[encodeMedia]]
    * on the audio modality (stateless batched mapPartitions +
    * expressions, streaming-ready unchanged). */
  private[graft] def encodeAudio(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val model =
      new graft.ops.ModelInference.WaveProjectionEmbedder(audioEmbDim)
    val batch = s.conf.get(graft.ops.ModelInference.batchSizeKey,
      graft.ops.ModelInference.defaultBatchSize.toString).toInt
    graft.ops.ModelInference.embedAudio(
      Multimodal.decodeWaves(s, media).toDF()
        .select("media_id", "samples"),
      "samples", model, batch)
      .select(col("media_id"),
        col("emb").as("e"),
        aggregate(transform(col("emb"), x => x * x), lit(0L),
          (acc, x) => acc + x).as("nrm"))
      .withColumn("bucket", bucketCol(col("e")))
  }

  /** The stored synthetic-WAV corpus ([[mediaStore]] on audio). */
  private[graft] def audioStore(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val store = s"${graft.ops.Fixtures.root(s)}/media_wav_" +
      graft.ops.Fixtures.pathKey(d)
    val stamp =
      graft.ops.Fixtures.datasetStamp(s, s"$d/documents.parquet") +
        s"|algo=${Multimodal.audioMediaAlgoVersion}|fmt=1"
    graft.ops.Fixtures.ensure(s, store, stamp) { stg =>
      Multimodal.syntheticAudioMedia(s, Catalog.documents(s, d))
        .write.mode("overwrite").parquet(stg)
    }
    s.read.parquet(store)
  }

  /** The shared oracle prefix of the audio family: closed-form samples
    * (`syntheticWav`'s formula verbatim) → per-dim projection sums
    * (`WaveProjectionEmbedder`'s matrix: sample t's weight for dim k is
    * ((t + 1)(k + 5)) mod 19 − 9) → norm + sign bucket, ending at the
    * same `ev(id, e, nrm, bucket)` relation [[mediaEvCtes]] ends at. */
  private def audioEvCtes: String = {
    val embCols = (1 to audioEmbDim).map(k =>
      s"CAST(sum(s * (((t + 1) * ${k + 5}) % 19 - 9)) AS BIGINT) AS e$k")
      .mkString(",\n")
    val eList = (1 to audioEmbDim).map(k => s"e$k").mkString("[", ", ", "]")
    val bucketSql = (1 to bucketBits).map(k =>
      s"CASE WHEN e[$k] > 0 THEN ${1L << (k - 1)} ELSE 0 END")
      .mkString(" + ")
    s"""sm AS (
       |  SELECT doc_id AS id, t,
       |    ((doc_id * 13 + t * t * 7 + t * 29) % 65536) - 32768 AS s
       |  FROM documents,
       |    LATERAL unnest(generate_series(0, 47 + doc_id % 17)) AS tt(t)),
       |emb AS MATERIALIZED (
       |  SELECT id, $embCols
       |  FROM sm GROUP BY id),
       |ev AS MATERIALIZED (
       |  SELECT id, e,
       |    list_aggregate(list_transform(e, x -> x * x), 'sum') AS nrm,
       |    $bucketSql AS bucket
       |  FROM (SELECT id, $eList AS e FROM emb))""".stripMargin
  }

  val q215 = {
    val queryMod = 103L
    Q("q215_audio_neardup_ann",
      (s, d) => {
        import org.apache.spark.sql.functions._
        // stored audio-ANN index: one stamped build per generation
        val idx = s"${graft.ops.Fixtures.root(s)}/audio_ann_" +
          graft.ops.Fixtures.pathKey(d)
        val stamp =
          graft.ops.Fixtures.datasetStamp(s, s"$d/documents.parquet") +
            s"|media=${Multimodal.audioMediaAlgoVersion}" +
            s"|emb=${graft.ops.ModelInference.audioEmbedAlgoVersion}" +
            s"|dim=$audioEmbDim|bits=$bucketBits|fmt=1"
        graft.ops.Fixtures.ensure(s, idx, stamp) { stg =>
          encodeAudio(s, audioStore(s, d)).write.mode("overwrite").parquet(stg)
        }
        val index = s.read.parquet(idx)
        // serving path: live container decode→embed of the query batch
        val queries = encodeAudio(s,
            audioStore(s, d).filter(col("media_id") % queryMod === 0))
          .select(col("media_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qnrm"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("match_id"))
        queries.join(index, "bucket")
          .filter(col("media_id") =!= col("query_id"))
          .select(col("query_id"), col("media_id").as("match_id"),
            (aggregate(zip_with(col("qe"), col("e"), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).cast("double")
              / sqrt(greatest(col("qnrm"), lit(1L)).cast("double")
                * greatest(col("nrm"), lit(1L)).cast("double")))
              .as("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("match_id"), col("cosine"))
      },
      Some {
        s"""WITH $audioEvCtes,
           |hits AS (
           |  SELECT q.id AS query_id, c.id AS match_id,
           |    CAST(list_aggregate(list_transform(
           |        generate_series(1, $audioEmbDim), i -> q.e[i] * c.e[i]),
           |        'sum') AS DOUBLE)
           |      / sqrt(CAST(greatest(q.nrm, 1) AS DOUBLE)
           |             * CAST(greatest(c.nrm, 1) AS DOUBLE)) AS cosine
           |  FROM ev q JOIN ev c ON q.bucket = c.bucket
           |  WHERE q.id % $queryMod = 0 AND c.id <> q.id)
           |SELECT query_id, match_id, cosine FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, match_id) AS rn
           |  FROM hits)
           |WHERE rn = 1""".stripMargin
      })
  }

  val all: Seq[Q] = Seq(q25, q133, q210, q214, q215)
}
