package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BATCHED MODEL-INFERENCE STAGE — the physical shape of the dominant
  * operator in a production LLM data pipeline: batched embed / score /
  * generate over a corpus, where the model call is an opaque
  * batch-in/batch-out function and everything around it (schema
  * contract, batch assembly, partition sizing, output encoding) is the
  * engine's job.
  *
  * In PySpark deployments this seam is `mapInArrow`/`mapInPandas` — an
  * Arrow-batched exchange to a Python/GPU worker. The Scala-native
  * analog here is a typed `mapPartitions` with EXPLICIT batch
  * iteration: rows are gathered into fixed-size batches, the model is
  * invoked ONCE per batch (the GPU-shaped entry point — codec/session
  * init and tensor launch amortize across the batch), and outputs are
  * re-zipped to their rows positionally. The stage deliberately breaks
  * whole-stage codegen — any model exchange does; the contract is that
  * everything BEFORE it (chunking, filtering, projection) and AFTER it
  * (joins, topk) stays in codegen'd declarative land, which
  * ModelInferenceSpec pins.
  *
  * Replayability contract: a [[TextEmbedder]] must be pure and
  * deterministic (same batch → same floats/ints on any executor, any
  * batch boundary), because a verifying oracle replays it. The shipped
  * [[HashedBowEmbedder]] is the deterministic stand-in (integer hashed
  * bag-of-tokens — exactly q186's embedding math, so the swap is
  * plan-shape-only); a production model swaps the `embedBatch` body
  * and nothing else.
  */
object ModelInference {

  /** The model seam: one BATCH of texts in, one embedding per text
    * out, invoked once per assembled batch. */
  trait TextEmbedder extends Serializable {
    def dim: Int
    def embedBatch(texts: Array[String]): Array[Array[Long]]
  }

  /** Deterministic integer hashed-BoW projection: dim j (1-based) =
    * Σ_tok (hash60(tok ++ ":" ++ j) mod 2001 − 1000) over the text's
    * whitespace tokens — q186's embedding, computed in the JVM instead
    * of SQL sums so the plan carries a REAL inference exchange while
    * the DuckDB oracle still replays the values bit-for-bit. */
  final class HashedBowEmbedder(val dim: Int) extends TextEmbedder {
    def embedBatch(texts: Array[String]): Array[Array[Long]] =
      texts.map { t =>
        // limit -1 keeps trailing empty tokens: the chunk text is an
        // array_join of whitespace-split tokens, and the round trip
        // must reproduce that token list exactly (a doc whose text
        // splits to an empty token must hash it here too, or the
        // oracle diverges)
        val toks = t.split(" ", -1)
        val e = new Array[Long](dim)
        var i = 0
        while (i < toks.length) {
          var j = 1
          while (j <= dim) {
            e(j - 1) += graft.functions.Hash60.hash(
              UTF8String.fromString(toks(i) + ":" + j)) % 2001 - 1000
            j += 1
          }
          i += 1
        }
        e
      }
  }

  /** Session conf for the per-call batch row count (the GPU-batch
    * dial); a real deployment sizes it to device memory. */
  val batchSizeKey = "spark.graft.inference.batchSize"
  val defaultBatchSize = 64

  /** Image-embedder algorithm version for fixture stamps — bump when
    * [[PixelProjectionEmbedder]]'s projection formula changes, so
    * stored image-ANN indexes rebuild instead of replaying stale
    * embeddings (the algoVersion pattern of Dedup/KnnGraph/LmCounts,
    * applied to the model seam). */
  val imageEmbedAlgoVersion = 1

  /** The SCORING face of the seam: one batch of feature vectors in,
    * one micro-scaled score per row out — batched classifier /
    * reward-model inference (the "score" member of the
    * embed/score/generate triple; same purity/determinism contract as
    * [[TextEmbedder]]). */
  trait VectorScorer extends Serializable {
    def scoreBatch(feats: Array[Array[Long]]): Array[Long]
  }

  /** Trained-weights scorer: micro-quantized linear model + the
    * RATIONAL sigmoid p = 1/2 + z/(2(1+|z|)), z = ⟨f,w⟩/10¹² — the
    * exact fixed-shape arithmetic the in-engine trainer (q191) and its
    * DuckDB oracle share, evaluated in the JVM so batch scoring
    * replays bit-for-bit. Output = round(p·10⁶) HALF_UP. */
  final class RationalLogisticScorer(w: Array[Long]) extends VectorScorer {
    def scoreBatch(feats: Array[Array[Long]]): Array[Long] =
      feats.map { f =>
        var dot = 0L
        var j = 0
        while (j < w.length) { dot += f(j) * w(j); j += 1 }
        val z = dot.toDouble / 1e12
        val p = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        new java.math.BigDecimal(p * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
  }

  /** Run `model` over `df`'s `featsCol` (array<bigint>), emitting every
    * other column unchanged plus `score_micro bigint`. Same batch-shape
    * contract as [[embed]]: order preserved, rows preserved, one model
    * call per `batchSize` rows. */
  def score(df: DataFrame, featsCol: String, model: VectorScorer,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val featsIdx = inSchema.fieldIndex(featsCol)
    val keep = inSchema.fields.indices.filterNot(_ == featsIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("score_micro", LongType, nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = model.scoreBatch(batch.iterator
          .map(_.getSeq[Long](featsIdx).toArray).toArray)
        require(scores.length == batch.length,
          s"model returned ${scores.length} scores for ${batch.length} inputs")
        batch.iterator.zip(scores.iterator).map { case (r, sc) =>
          Row.fromSeq(keep.map(r.get) :+ sc)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The PAIR face of the seam: one batch of (query, text) pairs in,
    * one micro-scaled relevance per pair out — batched CROSS-ENCODER
    * reranking, the second-stage scorer of a production retrieval /
    * data-curation stack (the model reads query and document JOINTLY,
    * so the score is not factorizable into two embeddings). Same
    * purity/determinism contract as [[TextEmbedder]]: a verifying
    * oracle replays it in closed form. */
  trait PairScorer extends Serializable {
    def scorePairBatch(queries: Array[String],
        texts: Array[String]): Array[Long]
  }

  /** Deterministic cross-encoder stand-in: first-position and
    * term-proximity interactions between the query's K whitespace
    * terms and the document's token stream. With p_k = 1-based FIRST
    * index of query term k in the doc's tokens (0 = absent):
    *
    *   score = Σ_k          [p_k>0]          (K−k) / (1+p_k)
    *         + Σ_{a<b} [p_a>0 ∧ p_b>0] (2K−a−b) / (1+|p_a−p_b|)
    *
    * terms summed in that fixed order (k asc, then (a,b) lexicographic
    * — FP accumulation order is part of the contract), micro-quantized
    * HALF_UP. The pairwise proximity term is what makes it CROSS: it
    * couples query terms through document positions, which no per-side
    * embedding can express. Tokenization matches the engine's
    * `TextAnalysis.tokens` (split on runs of whitespace, trailing
    * empties kept) so the oracle's regexp_split_to_array +
    * list_position replays it exactly. A production reranker swaps
    * `scorePairBatch` and nothing else. */
  final class TermProximityScorer extends PairScorer {
    def scorePairBatch(queries: Array[String],
        texts: Array[String]): Array[Long] = {
      require(queries.length == texts.length,
        s"${queries.length} queries for ${texts.length} texts")
      queries.iterator.zip(texts.iterator).map { case (q, t) =>
        val terms = q.split("\\s+", -1)
        val toks = t.split("\\s+", -1)
        val k = terms.length
        val pos = terms.map(term => toks.indexOf(term) + 1) // 0 = absent
        var s = 0.0
        var i = 0
        while (i < k) {
          if (pos(i) > 0) s += (k - i).toDouble / (1.0 + pos(i))
          i += 1
        }
        var a = 0
        while (a < k) {
          var b = a + 1
          while (b < k) {
            if (pos(a) > 0 && pos(b) > 0)
              s += (2 * k - a - b).toDouble /
                (1.0 + math.abs(pos(a) - pos(b)))
            b += 1
          }
          a += 1
        }
        new java.math.BigDecimal(s * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }.toArray
    }
  }

  /** Run `model` over `df`'s (`queryCol`, `textCol`) pairs, emitting
    * every other column unchanged plus `ce_micro bigint`. Same
    * batch-shape contract as [[embed]]: order preserved, rows
    * preserved, one model call per `batchSize` rows. */
  def scorePairs(df: DataFrame, queryCol: String, textCol: String,
      model: PairScorer, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val qIdx = inSchema.fieldIndex(queryCol)
    val tIdx = inSchema.fieldIndex(textCol)
    val keep = inSchema.fields.indices.filterNot(i => i == qIdx || i == tIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("ce_micro", LongType, nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = model.scorePairBatch(
          batch.iterator.map(_.getString(qIdx)).toArray,
          batch.iterator.map(_.getString(tIdx)).toArray)
        require(scores.length == batch.length,
          s"model returned ${scores.length} scores for ${batch.length} inputs")
        batch.iterator.zip(scores.iterator).map { case (r, sc) =>
          Row.fromSeq(keep.map(r.get) :+ sc)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The GENERATION face of the seam: one batch of seed/prompt strings
    * in, one generated token sequence per row out — batched
    * autoregressive generation (the "generate" member of the
    * embed/score/generate triple; same purity/determinism contract as
    * [[TextEmbedder]], so a verifying oracle can replay it). */
  trait TextGenerator extends Serializable {
    def generateBatch(seeds: Array[String]): Array[Array[String]]
  }

  /** Greedy bigram-LM decoder: from each seed token, repeatedly emit
    * the stored LM's most-likely successor (argmax count, ties to the
    * lexicographically smallest token) until `maxTokens` or a dead end
    * — the deterministic, oracle-replayable stand-in for sampled LLM
    * decoding. The successor table ships to executors ONCE as a Spark
    * broadcast, exactly as model weights ship to a GPU worker. */
  final class GreedyBigramGenerator(
      succ: org.apache.spark.broadcast.Broadcast[Map[String, String]],
      maxTokens: Int) extends TextGenerator {
    def generateBatch(seeds: Array[String]): Array[Array[String]] =
      seeds.map { s0 =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = s0
        var more = true
        while (out.length < maxTokens && more) {
          succ.value.get(cur) match {
            case Some(n) => out += n; cur = n
            case None => more = false
          }
        }
        out.toArray
      }
  }

  /** Run `model` over `df`'s `seedCol`, emitting every other column
    * unchanged plus `gen array<string>`. Same batch-shape contract as
    * [[embed]]. */
  def generate(df: DataFrame, seedCol: String, model: TextGenerator,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val seedIdx = inSchema.fieldIndex(seedCol)
    val keep = inSchema.fields.indices.filterNot(_ == seedIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("gen",
          ArrayType(org.apache.spark.sql.types.StringType,
            containsNull = false), nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val gens = model.generateBatch(
          batch.iterator.map(_.getString(seedIdx)).toArray)
        require(gens.length == batch.length,
          s"model returned ${gens.length} generations for ${batch.length} inputs")
        batch.iterator.zip(gens.iterator).map { case (r, g) =>
          Row.fromSeq(keep.map(r.get) :+ (g.toIndexedSeq: Seq[String]))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The IMAGE face of the seam: one batch of RGB tensors in, one
    * embedding per tensor out — the CLIP-shaped media entry point
    * (same batch/purity/determinism contract as [[TextEmbedder]], so
    * a verifying oracle can replay it from closed-form pixels). */
  trait ImageEmbedder extends Serializable {
    def dim: Int
    def embedBatch(tensors: Array[Array[Byte]]): Array[Array[Long]]
  }

  /** Deterministic integer pixel projection: dim k (1-based) =
    * Σ_p byte(p) · (((p + 1) · (k + 7)) mod 23 − 11) over the tensor's
    * bytes — a fixed random-ish ±11 projection matrix indexed by byte
    * offset, exactly replayable in SQL from the synthetic-pixel
    * formulas (the [[HashedBowEmbedder]] role for media rows; a
    * production model swaps `embedBatch` and nothing else). */
  final class PixelProjectionEmbedder(val dim: Int) extends ImageEmbedder {
    def embedBatch(tensors: Array[Array[Byte]]): Array[Array[Long]] =
      tensors.map { t =>
        val e = new Array[Long](dim)
        var p = 0
        while (p < t.length) {
          val v = (t(p) & 0xff).toLong
          var k = 1
          while (k <= dim) {
            e(k - 1) += v * (((p + 1).toLong * (k + 7)) % 23 - 11)
            k += 1
          }
          p += 1
        }
        e
      }
  }

  /** Run `model` over `df`'s `tensorCol` (binary), emitting every
    * other column unchanged plus `emb array<bigint>` — [[embed]]'s
    * contract on media rows. */
  def embedImages(df: DataFrame, tensorCol: String, model: ImageEmbedder,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val tensorIdx = inSchema.fieldIndex(tensorCol)
    val keep = inSchema.fields.indices.filterNot(_ == tensorIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("emb", ArrayType(LongType, containsNull = false),
          nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = model.embedBatch(batch.iterator
          .map(_.getAs[Array[Byte]](tensorIdx)).toArray)
        require(embs.length == batch.length,
          s"model returned ${embs.length} embeddings for ${batch.length} inputs")
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          Row.fromSeq(keep.map(r.get) :+ (e.toIndexedSeq: Seq[Long]))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** The AUDIO face of the seam: one batch of PCM waveforms in (signed
    * sample values, channel-interleaved — the decoded form an audio
    * model consumes; container parsing is the engine's decode stage,
    * [[Multimodal.decodeWavSamples]]), one embedding per waveform out —
    * the audio twin of [[ImageEmbedder]], same batch/purity/determinism
    * contract so a verifying oracle replays it from closed-form
    * samples. */
  trait AudioEmbedder extends Serializable {
    def dim: Int
    def embedBatch(waves: Array[Array[Long]]): Array[Array[Long]]
  }

  /** Audio-embedder algorithm version for fixture stamps — the
    * [[imageEmbedAlgoVersion]] discipline on the audio face. */
  val audioEmbedAlgoVersion = 1

  /** Deterministic integer waveform projection: dim k (1-based) =
    * Σ_t s_t · (((t + 1) · (k + 5)) mod 19 − 9) over the waveform's
    * samples — a fixed ±9 projection matrix indexed by sample position
    * (the [[PixelProjectionEmbedder]] role for audio rows; a production
    * model swaps `embedBatch` and nothing else). */
  final class WaveProjectionEmbedder(val dim: Int) extends AudioEmbedder {
    def embedBatch(waves: Array[Array[Long]]): Array[Array[Long]] =
      waves.map { s =>
        val e = new Array[Long](dim)
        var t = 0
        while (t < s.length) {
          var k = 1
          while (k <= dim) {
            e(k - 1) += s(t) * (((t + 1).toLong * (k + 5)) % 19 - 9)
            k += 1
          }
          t += 1
        }
        e
      }
  }

  /** Run `model` over `df`'s `wavesCol` (array<bigint> PCM samples),
    * emitting every other column unchanged plus `emb array<bigint>` —
    * [[embed]]'s contract on audio rows. */
  def embedAudio(df: DataFrame, wavesCol: String, model: AudioEmbedder,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val wavesIdx = inSchema.fieldIndex(wavesCol)
    val keep = inSchema.fields.indices.filterNot(_ == wavesIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("emb", ArrayType(LongType, containsNull = false),
          nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = model.embedBatch(batch.iterator
          .map(_.getSeq[Long](wavesIdx).toArray).toArray)
        require(embs.length == batch.length,
          s"model returned ${embs.length} embeddings for ${batch.length} inputs")
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          Row.fromSeq(keep.map(r.get) :+ (e.toIndexedSeq: Seq[Long]))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Run `model` over `df`'s `textCol`, emitting every other column
    * unchanged plus `emb array<bigint>`. Schema contract: input order
    * is preserved within a partition, output rows = input rows, and
    * the model sees batches of exactly `batchSize` rows (last batch
    * per partition may be short). */
  def embed(df: DataFrame, textCol: String, model: TextEmbedder,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"inference batch size must be >= 1, got $batchSize")
    val inSchema = df.schema
    val textIdx = inSchema.fieldIndex(textCol)
    val keep = inSchema.fields.indices.filterNot(_ == textIdx)
    val outSchema = StructType(
      keep.map(inSchema.fields) :+
        StructField("emb", ArrayType(LongType, containsNull = false),
          nullable = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = model.embedBatch(
          batch.iterator.map(_.getString(textIdx)).toArray)
        require(embs.length == batch.length,
          s"model returned ${embs.length} embeddings for ${batch.length} inputs")
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          Row.fromSeq(keep.map(r.get) :+ (e.toIndexedSeq: Seq[Long]))
        }
      }
    }(Encoders.row(outSchema))
  }
}
