package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries

class CorpusSpec extends SparkSuite {

  test("q79 packing: offsets stay inside the budget and tile each source") {
    val out = CorpusQueries.q79.run(spark, sf).cache()
    assert(out.filter(col("seq_off") < 0 || col("seq_off") >= 512).count() == 0)
    // per source, the first doc starts at (seq 0, off 0) and start
    // offsets reconstruct the running token sum exactly
    val w = Window.partitionBy("source").orderBy("doc_id")
    val recon = out
      .withColumn("expect_start",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("seq_id") * 512 + col("seq_off") =!= col("expect_start"))
    assert(recon.count() == 0)
    out.unpersist()
  }

  test("q80 repetition fractions match a hand computation per doc") {
    val row = graft.tables.Catalog.documents(spark, sf)
      .orderBy("doc_id").select("doc_id", "text").head()
    val toks = row.getString(1).trim.split("\\s+").toSeq
    val topUni = toks.groupBy(identity).map(_._2.size).max.toDouble / toks.size
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val dupBi =
      (bigrams.size - bigrams.distinct.size).toDouble / bigrams.size
    val got = CorpusQueries.q80.run(spark, sf)
      .filter(col("doc_id") === row.getLong(0)).head()
    assert(math.abs(got.getAs[Double]("top_unigram_frac") - topUni) < 1e-12)
    assert(math.abs(got.getAs[Double]("dup_bigram_frac") - dupBi) < 1e-12)
  }

  test("q81 equals the window row_number formulation") {
    val viaTopK = CorpusQueries.q81.run(spark, sf)
    // same scored relation, ranked the classic way
    val docs = graft.tables.Catalog.documents(spark, sf)
    val toks = docs.select(col("doc_id"),
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, "t").crossJoin(broadcast(n))
      .select(col("doc_id"), col("t").as("term"),
        round(col("tf").cast("double")
          * log(col("n_docs") / col("df").cast("double")) * 1e6)
          .cast("bigint").as("score_micro"))
    val viaWindow = scored
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("term").asc)))
      .filter(col("rn") <= 3).drop("rn")
    assertSameRows(viaTopK, viaWindow)
  }

  test("q82 removes every stopword and nothing else") {
    val out = CorpusQueries.q82.run(spark, sf)
    val bad = out.filter(
      CorpusQueries.stopwords.map(w =>
        col("clean_text").rlike(s"(^| )$w( |$$)")).reduce(_ || _))
    assert(bad.count() == 0)
    assert(out.filter(col("n_kept") > col("n_tokens")).count() == 0)
    // kept count is consistent with the cleaned text itself
    val mismatch = out.filter(col("n_kept") =!=
      when(col("clean_text") === "", 0L)
        .otherwise(size(split(col("clean_text"), " ")).cast("bigint")))
    assert(mismatch.count() == 0)
  }

  test("q82 plans as a pure projection — zero exchanges") {
    val plan = CorpusQueries.q82.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("q84 semantic dedup finds every injected exact duplicate") {
    val out = graft.queries.SimilarityQueries.q84.run(spark, sf).cache()
    val injected = graft.tables.Catalog.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("vec_a"),
        (col("vec_id") + 100000L).as("vec_b"))
    // identical embeddings land in the same cell and sign bucket, so
    // every injected pair must surface, at cosine exactly 1.0
    val missed = injected.join(out, Seq("vec_a", "vec_b"), "left_anti")
    assert(missed.count() == 0)
    assert(out.join(injected, Seq("vec_a", "vec_b"), "left_semi")
      .filter(col("cosine") =!= 1.0).count() == 0)
    out.unpersist()
  }

  test("q83 shards are dense, positions contiguous, rerun-identical") {
    val out = CorpusQueries.q83.run(spark, sf).cache()
    assert(out.filter(col("shard") < 0 || col("shard") >= 16).count() == 0)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos_in_shard").as("mx"),
        min("pos_in_shard").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(perShard.count() == 0)
    assertSameRows(out, CorpusQueries.q83.run(spark, sf))
    out.unpersist()
  }
  test("q88 packs exactly 512 tokens per sequence and loses none") {
    val out = CorpusQueries.q88.run(spark, sf).cache()
    // every sequence but each source's last (max seq_id) is exactly full
    val tails = out.groupBy("source").agg(max("seq_id").as("last_seq"))
    val short = out.join(tails, "source")
      .filter(col("seq_id") =!= col("last_seq") &&
        col("n_tokens") =!= 512L)
    assert(short.count() == 0)
    // token conservation: packed total == corpus total
    val packedTotal = out.agg(sum("n_tokens")).head().getLong(0)
    val corpusTotal = graft.tables.Catalog.documents(spark, sf)
      .select(sum(size(graft.ops.TextAnalysis.tokens(col("text"))))
        .cast("bigint")).head().getLong(0)
    assert(packedTotal == corpusTotal)
    out.unpersist()
  }

  test("bounded top-k aggregate equals the window form on any partitioning") {
    import SparkSpec.spark.implicits._
    val rows = (1L to 200L).map(i => ((i % 7).toString, i * 37 % 101))
    val base = rows.toDF("g", "v")
    def viaAgg(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(graft.functions.BoundedTopKAgg.smallestCsv(col("v"), 5).as("s"))
    val expected = base
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy("v")))
      .filter(col("rn") <= 5).groupBy("g")
      .agg(concat_ws(",", sort_array(collect_list(col("v")))).as("s"))
    // 1-partition and many-partition runs must agree with the window
    // form — exercises update, serialize/deserialize, and merge paths
    assertSameRows(viaAgg(base.coalesce(1)), expected)
    assertSameRows(viaAgg(base.repartition(13)), expected)
  }

  test("q87 global rank avoids the single-task global window") {
    val out = graft.queries.CorpusQueries.q87.run(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // the row_number window must be keyed by _pid (parallel) — the
    // naive form's windowspec starts with the ORDER columns instead.
    // (The offsets window runs over one row per partition; its tiny
    // SinglePartition exchange is the design, not a violation.)
    assert(plan.contains("row_number() windowspecdefinition(_pid"), plan)
    // and it must agree with the naive global formulation
    val naive = graft.tables.Catalog.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("bigint"))
    assertSameRows(out, naive)
  }
}

/** The text-cleaning surface (quality score, PII redaction, stopword
  * filter) is pure narrow projections, so the same Column expressions
  * must drop into a Structured Streaming pipeline unchanged — this is
  * the §2.9 composition contract for the corpus operators. */
class CorpusStreamingSpec extends SparkSuite {
  import SparkSpec.spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streamed text cleaning equals the batch projection") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.tables.Catalog.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(40)
      .as[(Long, String)].collect().toSeq
    def clean(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.ops.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.ops.TextAnalysis.redactPii(col("text")).as("red"),
      concat_ws(" ", filter(graft.ops.TextAnalysis.tokens(col("text")),
        t => !t.isInCollection(CorpusQueries.stopwords))).as("kept"))

    val input = MemoryStream[(Long, String)]
    val q = clean(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("corpus_clean")
      .outputMode("append").start()
    try {
      input.addData(docs.take(20)); q.processAllAvailable()
      input.addData(docs.drop(20)); q.processAllAvailable()
    } finally q.stop()

    assertSameRows(spark.table("corpus_clean"),
      clean(docs.toDF("doc_id", "text")))
  }

  test("q176 substring dedup: spans are k-gram unions, counts consistent") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.CorpusQueries.q176.run(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty, "synthetic docs share 8-grams — output must be non-empty")
    rows.foreach { r =>
      val (spans, dup, total) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every span is a union of 8-token windows, so each has >= 8 tokens
      assert(dup >= spans * 8, s"doc ${r.getLong(0)}: $spans spans but only $dup dup tokens")
      assert(dup <= total, s"doc ${r.getLong(0)}: more dup tokens than tokens")
    }
    // duplicated coverage is symmetric-ish: a shared 8-gram marks BOTH
    // docs, so at least two docs are affected
    assert(rows.length >= 2)
    assert(out.filter(col("n_spans") <= 0).count() == 0)
  }
}
