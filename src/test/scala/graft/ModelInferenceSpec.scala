package graft


import org.apache.spark.sql.functions._

import graft.ops.ModelInference
import graft.tables.Catalog

/** The batched model-inference stage ([[graft.ops.ModelInference]]):
  * value parity with the declarative SQL-sums formulation, the batch
  * shape contract (one model call per batchSize rows), the schema
  * contract, and the plan seam q186 rides (inference exchange between
  * two codegen'd spans).
  */
class ModelInferenceSpec extends SparkSuite {

  private val dims = 16

  private def chunks = {
    import graft.ops.TextAnalysis
    Catalog.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr("(size(t) - 1) div 16"))).as("ci"),
        col("t"))
      .select(col("doc_id"), col("ci"),
        array_join(slice(col("t"), (col("ci") * 16 + 1).cast("int"),
          lit(16)), " ").as("chunk_text"))
  }

  test("hashed-BoW embedder matches the declarative SQL-sums embedding") {
    import graft.ops.TextAnalysis
    val got = ModelInference.embed(chunks, "chunk_text",
      new ModelInference.HashedBowEmbedder(dims), 64)
      .select(col("doc_id"), col("ci"), col("emb"))
    // the former q186 formulation: explode chunk tokens, 16 hashed sums
    val toks = Catalog.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), expr("(size(t) - 1) div 16"))).as("ci"))
      .select(col("doc_id"), col("ci"),
        explode(slice(col("t"), (col("ci") * 16 + 1).cast("int"),
          lit(16))).as("tok"))
    val sums = (1 to dims).map(j =>
      sum(TextAnalysis.hash60(concat(col("tok"), lit(s":$j")))
        % 2001 - 1000).as(s"e$j"))
    val want = toks.groupBy(col("doc_id"), col("ci"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), col("ci"),
        array((1 to dims).map(j => col(s"e$j")): _*).as("emb"))
    assertSameRows(got, want)
  }

  test("model sees full batches: one call per batchSize rows, order kept") {
    // an accumulator, not driver-side collection state: the embedder
    // closure is serialized per task, so executor-side adds to a plain
    // queue would land in a deserialized copy the driver never sees
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val probe = new ModelInference.TextEmbedder {
      val dim = 2
      def embedBatch(texts: Array[String]): Array[Array[Long]] = {
        sizes.add(texts.length)
        texts.map(t => Array(t.length.toLong, 1L))
      }
    }
    val df = chunks.repartition(2)
    val out = ModelInference.embed(df, "chunk_text", probe, 32)
    val n = out.count()
    assert(n == chunks.count(), "inference must be row-preserving")
    import scala.jdk.CollectionConverters._
    val observed = sizes.value.asScala.map(_.toInt).toSeq
    assert(observed.sum == n)
    assert(observed.forall(_ <= 32), s"batch over size: ${observed.toSeq}")
    // at most one short batch per partition — batches are FULL except
    // each partition's tail (the GPU-utilization property)
    assert(observed.count(_ < 32) <= 2,
      s"more short batches than partitions: ${observed.toSeq}")
  }

  test("schema contract: non-text columns ride through, emb appended") {
    val out = ModelInference.embed(chunks, "chunk_text",
      new ModelInference.HashedBowEmbedder(4), 16)
    assert(out.columns.toSeq == Seq("doc_id", "ci", "emb"))
    assert(out.schema("emb").dataType.simpleString == "array<bigint>")
  }

  test("batch scorer replays the declarative scoring bit-for-bit (q208 ≡ q191)") {
    val viaSeam = graft.queries.TextQueries.q208.run(spark, sf)
    val declarative = graft.queries.TextQueries.q191.run(spark, sf)
    assertSameRows(viaSeam, declarative)
  }

  test("score stage: one call per batchSize rows, rows preserved") {
    val calls = spark.sparkContext.collectionAccumulator[Int]("scoreBatches")
    val probe = new ModelInference.VectorScorer {
      def scoreBatch(feats: Array[Array[Long]]): Array[Long] = {
        calls.add(feats.length)
        feats.map(_.sum)
      }
    }
    val df = chunks.select(col("doc_id"), col("ci"),
      array(length(col("chunk_text")).cast("bigint")).as("f"))
      .repartition(2)
    val out = ModelInference.score(df, "f", probe, 32)
    assert(out.columns.toSeq == Seq("doc_id", "ci", "score_micro"))
    val n = out.count()
    assert(n == chunks.count())
    import scala.jdk.CollectionConverters._
    val observed = calls.value.asScala.map(_.toInt).toSeq
    assert(observed.sum == n)
    assert(observed.forall(_ <= 32) && observed.count(_ < 32) <= 2)
  }

  test("generate stage: greedy decode is deterministic, dead ends stop, batches shaped") {
    val succ = spark.sparkContext.broadcast(
      Map("a" -> "b", "b" -> "c", "c" -> "a", "x" -> "y"))
    val gen = new ModelInference.GreedyBigramGenerator(succ, 5)
    // cycle: follows argmax successors for exactly maxTokens
    assert(gen.generateBatch(Array("a")).head.toSeq ==
      Seq("b", "c", "a", "b", "c"))
    // dead end: y has no successor -> stops after one token
    assert(gen.generateBatch(Array("x")).head.toSeq == Seq("y"))
    // unknown seed: generates nothing
    assert(gen.generateBatch(Array("zzz")).head.isEmpty)
    // determinism across calls
    assert(gen.generateBatch(Array("a", "x")).map(_.toSeq).toSeq ==
      gen.generateBatch(Array("a", "x")).map(_.toSeq).toSeq)
    // stage contract: rows preserved, gen column appended
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "x"), (3L, "zzz")).toDF("id", "seed")
    val out = ModelInference.generate(df, "seed", gen, 2)
    assert(out.columns.toSeq == Seq("id", "gen"))
    val got = out.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got == Map(1L -> Seq("b", "c", "a", "b", "c"),
      2L -> Seq("y"), 3L -> Seq.empty))
  }

  test("image embedder: one call per batch, pixel projection exact") {
    import graft.ops.ModelInference
    val m = new ModelInference.PixelProjectionEmbedder(4)
    val t = Array[Byte](10, -1, 0, 127) // -1 reads as 255 (unsigned)
    val e = m.embedBatch(Array(t))(0)
    val expect = (1 to 4).map { k =>
      t.zipWithIndex.map { case (b, p) =>
        (b & 0xff).toLong * (((p + 1).toLong * (k + 7)) % 23 - 11)
      }.sum
    }
    assert(e.toSeq == expect, s"projection mismatch: ${e.toSeq} vs $expect")
    // batch accounting on the DataFrame stage (accumulator: the
    // embedder closure is task-serialized, a plain var would count on
    // the deserialized copy)
    val calls = spark.sparkContext.longAccumulator("imageEmbedCalls")
    val counting = new ModelInference.ImageEmbedder {
      val dim = 2
      def embedBatch(ts: Array[Array[Byte]]): Array[Array[Long]] = {
        calls.add(1); ts.map(_ => Array(0L, 0L))
      }
    }
    val sp = spark
    import sp.implicits._
    val df = (1 to 10).map(i => (i.toLong, Array.fill(3)(i.toByte)))
      .toDF("media_id", "tensor").coalesce(1)
    val n = ModelInference.embedImages(df, "tensor", counting, 4).count()
    assert(n == 10 && calls.value == 3,
      s"rows=$n calls=${calls.value} (want 10 rows, 3 calls)")
  }

  test("q210 plans the image-inference seam on media rows " +
      "(decode->resize->embed before the index probe)") {
    val out = graft.queries.MultimodalQueries.q210.run(spark, sf)
    out.collect() // finalize the adaptive plan so codegen spans render
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"q210 must carry the batched media+inference stages:\n${plan.take(2000)}")
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"the spans around the seam must stay codegen'd:\n${plan.take(2000)}")
  }

  test("pair scorer matches the declarative position-interaction scoring") {
    // declarative twin: array_position is 1-based with 0 for absent —
    // exactly TermProximityScorer's pos contract; accumulation order
    // (singles k asc, then pairs lexicographic) mirrored term-by-term
    import graft.ops.TextAnalysis
    val terms = Seq("vector", "merge", "stream")
    val k = terms.length
    val docs = Catalog.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val got = ModelInference.scorePairs(
      docs.select(col("doc_id"),
        lit(terms.mkString(" ")).as("q"), col("text")),
      "q", "text", new ModelInference.TermProximityScorer, 64)
    val withPos = terms.indices.foldLeft(
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))) {
      (df, i) => df.withColumn(s"p$i", array_position(col("t"), terms(i)))
    }
    val singles = terms.indices.map(i =>
      when(col(s"p$i") > 0,
        lit((k - i).toDouble) / (lit(1.0) + col(s"p$i").cast("double")))
        .otherwise(lit(0.0)))
    val pairTerms = for { a <- 0 until k; b <- (a + 1) until k } yield
      when(col(s"p$a") > 0 && col(s"p$b") > 0,
        lit((2 * k - a - b).toDouble) /
          (lit(1.0) + abs(col(s"p$a") - col(s"p$b")).cast("double")))
        .otherwise(lit(0.0))
    val want = withPos.select(col("doc_id"),
      round((singles ++ pairTerms).reduce(_ + _) * 1e6)
        .cast("bigint").as("ce_micro"))
    assertSameRows(got, want)
  }

  test("pair stage: one call per batchSize rows, schema contract") {
    val calls = spark.sparkContext.collectionAccumulator[Int]("pairBatches")
    val probe = new ModelInference.PairScorer {
      def scorePairBatch(qs: Array[String],
          ts: Array[String]): Array[Long] = {
        calls.add(qs.length)
        qs.zip(ts).map { case (q, t) => (q.length + t.length).toLong }
      }
    }
    val df = chunks.select(col("doc_id"), col("ci"),
      lit("a b").as("q"), col("chunk_text")).repartition(2)
    val out = ModelInference.scorePairs(df, "q", "chunk_text", probe, 32)
    assert(out.columns.toSeq == Seq("doc_id", "ci", "ce_micro"))
    val n = out.count()
    assert(n == chunks.count())
    import scala.jdk.CollectionConverters._
    val observed = calls.value.asScala.map(_.toInt).toSeq
    assert(observed.sum == n)
    assert(observed.forall(_ <= 32) && observed.count(_ < 32) <= 2)
  }

  test("q212 reranks within the BM25 candidate set " +
      "(pair seam scan-local, candidates bounded)") {
    val out = graft.queries.TextQueries.q212.run(spark, sf)
    val rows = out.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    // every reranked doc must come from the BM25 top-50
    val cand = graft.queries.TextQueries.q109.run(spark, sf)
      .collect().map(_.getLong(0)).toSet // top10 ⊆ top50; weak sanity
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"q212 must carry the batched pair-inference stage:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoop"),
      s"candidate fetch must broadcast the 50-row side:\n${plan.take(2000)}")
    // ce order strictly enforced with doc_id tiebreak
    val ce = rows.map(r => (r.getLong(2), r.getLong(0)))
    assert(ce.sameElements(ce.sortBy(t => (-t._1, t._2))),
      s"rerank order violated: ${ce.toSeq}")
    assert(cand.nonEmpty) // q109 itself returns rows at this sf
  }

  test("q213: online scoring equals offline batch scoring, " +
      "across >= 2 real micro-batches") {
    val got = graft.queries.StreamQueries.q213.run(spark, sf)
    val want = graft.queries.TextQueries.q208.run(spark, sf)
      .select(col("doc_id"), col("p_micro"))
    assertSameRows(got, want)
    // the checkpoint's commit log records one entry per micro-batch —
    // prove the seam really ran incrementally, not as one big batch
    val base = s"${graft.ops.Scratch.dir(spark)}/graft_stream/" +
      s"q213_${java.nio.file.Paths.get(sf).getFileName}"
    val commits = new java.io.File(s"$base/ckpt/commits")
      .list().count(n => n.forall(_.isDigit))
    assert(commits >= 2, s"expected >= 2 committed micro-batches, got $commits")
  }

  test("q214: streaming media ingest equals batch encode, " +
      "across >= 2 real micro-batches") {
    import graft.queries.MultimodalQueries
    val got = MultimodalQueries.q214.run(spark, sf)
    // batch twin: the same encode over the full media store, through
    // the engine's own stages (the oracle separately replays it in
    // closed form) — stream output must match exactly, no dupes
    val want = MultimodalQueries.encodeMedia(spark,
      MultimodalQueries.mediaStore(spark, sf))
      .select(col("media_id"), col("bucket"), col("nrm"))
    assertSameRows(got, want)
    val base = s"${graft.ops.Scratch.dir(spark)}/graft_stream/" +
      s"q214_${java.nio.file.Paths.get(sf).getFileName}"
    val commits = new java.io.File(s"$base/ckpt/commits")
      .list().count(n => n.forall(_.isDigit))
    assert(commits >= 2, s"expected >= 2 committed micro-batches, got $commits")
  }

  test("q186 plans the inference exchange between declarative spans") {
    val df = graft.queries.SimilarityQueries.q186.run(spark, sf)
    // materialize first (r18): the rebalanced corpus scan made the
    // chunk-index subplan adaptive, and AQE prints codegen "*(n)"
    // markers only once stages are FINAL — the unexecuted printout
    // hid spans that execution does codegen
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"q186 must carry the batched inference stage:\n${plan.take(2000)}")
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"the spans around the seam must stay codegen'd:\n${plan.take(2000)}")
  }
}
