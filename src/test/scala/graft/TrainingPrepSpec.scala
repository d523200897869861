package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.queries.{SimilarityQueries, TextQueries}
import graft.tables.Catalog

/** Round-9 training-data-prep additions: bigram-LM perplexity scoring
  * (q178), int8 scalar-quantized ANN (q179), preference-pair
  * construction (q180), and matryoshka truncation eval (q181). */
class TrainingPrepSpec extends SparkSuite {

  private def byName(n: String) =
    SparkEntry.registry.find(_.name == n).get.run(spark, sf)

  test("q178: one score per multi-token doc; n_bigrams = tokens - 1") {
    val got = byName("q178_bigram_perplexity")
    val expect = Catalog.documents(spark, sf)
      .select(col("doc_id"),
        (size(TextAnalysis.tokens(col("text"))) - 1).cast("bigint")
          .as("want"))
      .filter(col("want") >= 1)
    assert(got.select(col("doc_id")).distinct().count() == got.count())
    val joined = got.join(expect, Seq("doc_id"), "full")
    assert(joined.filter(col("n_bigrams").isNull || col("want").isNull ||
      col("n_bigrams") =!= col("want")).count() == 0)
    // interpolated probabilities are < 1 → mean −log2 p strictly positive
    assert(got.filter(col("nll_micro") <= 0).count() == 0)
  }

  test("q179: int8 candidates + exact rerank reproduce the brute top-k") {
    val brute = byName("q23_similarity_topk_brute")
    val got = byName("q179_int8_quantized_ann")
      .select(col("vec_id"), col("label"), col("cosine"))
    assertSameRows(got, brute)
  }

  test("q180: pairs have strict positive margin, bounded rank, distinct sides") {
    val got = byName("q180_preference_pairs").cache()
    assert(got.filter(col("margin_micro") <= 0).count() == 0)
    assert(got.filter(col("pair_rank") > 3).count() == 0)
    assert(got.filter(col("chosen_doc_id") === col("rejected_doc_id"))
      .count() == 0)
    // at most pairK pairs per language group
    assert(got.groupBy(col("lang")).count()
      .filter(col("count") > 3).count() == 0)
    got.unpersist()
  }

  test("q182: batch MaxSim's shared query reproduces q167 exactly") {
    val single = byName("q167_late_interaction")
      .select(col("doc_id"), col("maxsim"))
    val batch0 = byName("q182_late_interaction_batch")
      .filter(col("query_id") === 0)
      .select(col("doc_id"), col("maxsim"))
    assertSameRows(batch0, single)
  }

  test("q183: turns partition each doc's tokens; only assistant turns train") {
    val got = byName("q183_chat_sft_prep").cache()
    val want = Catalog.documents(spark, sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n"))
    // Σ n_tokens per doc == the doc's token count (no token lost/dup'd)
    val sums = got.groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("got_n"))
    assert(sums.join(want, Seq("doc_id"))
      .filter(col("got_n") =!= col("n")).count() == 0)
    // the loss mask: user turns contribute 0, assistant turns all tokens
    assert(got.filter(col("role") === "user" && col("loss_tokens") =!= 0)
      .count() == 0)
    assert(got.filter(col("role") === "assistant" &&
      col("loss_tokens") =!= col("n_tokens")).count() == 0)
    // sequence ids are non-decreasing in turn order within a doc
    import org.apache.spark.sql.expressions.Window
    val lagged = got.withColumn("prev", lag(col("seq_id"), 1).over(
      Window.partitionBy(col("doc_id")).orderBy(col("turn_idx"))))
    assert(lagged.filter(col("prev").isNotNull &&
      col("seq_id") < col("prev")).count() == 0)
    got.unpersist()
  }

  test("q184: advantages are group-centered and zero for no-variance groups") {
    val got = byName("q184_group_advantage").cache()
    assert(got.count() ==
      Catalog.documents(spark, sf).count())
    // micro-rounded advantages sum to ~0 within every group (|Σ| ≤ n/2
    // micro from per-row rounding)
    val bad = got.groupBy(col("lang"), col("source"))
      .agg(sum(col("adv_micro")).as("s"), count(lit(1)).as("n"))
      .filter(abs(col("s")) > col("n"))
    assert(bad.count() == 0)
    got.unpersist()
  }

  test("q185: FIM segments conserve tokens and reorder by mode") {
    val got = byName("q185_fim_transform").cache()
    val want = Catalog.documents(spark, sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n"))
      .filter(col("n") >= 3)
    assert(got.count() == want.count())
    // segments partition the token stream
    assert(got.join(want, Seq("doc_id"))
      .filter(col("n_prefix") + col("n_middle") + col("n_suffix")
        =!= col("n")).count() == 0)
    // the serialized stream carries all tokens + 3 sentinels
    assert(got.join(want, Seq("doc_id"))
      .filter(size(split(col("fim_str"), "\\|")) =!= col("n") + 3)
      .count() == 0)
    // mode follows doc parity, and the stream leads with its sentinel
    assert(got.filter((col("doc_id") % 2 === 0) =!=
      (col("fim_order") === "psm")).count() == 0)
    assert(got.filter(col("fim_order") === "psm" &&
      !col("fim_str").startsWith("<PRE>")).count() == 0)
    assert(got.filter(col("fim_order") === "spm" &&
      !col("fim_str").startsWith("<SUF>")).count() == 0)
    got.unpersist()
  }

  test("q186: retrieval ranks are consecutive with non-increasing cosine") {
    val got = byName("q186_rag_pipeline")
      .orderBy(col("rank")).collect()
    assert(got.nonEmpty && got.length <= 5)
    assert(got.map(_.getLong(0)).toSeq == (1L to got.length).toSeq)
    val cos = got.map(_.getDouble(3)).toSeq
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    // the query chunk itself never appears
    assert(!got.exists(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("q187: streaming LM counts span real micro-batches and reconcile") {
    val got = byName("q187_stream_lm_counts")
    // independent batch recount of the same top-50
    val expect = Catalog.documents(spark, sf)
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .groupBy(col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(50)
    assertSameRows(got, expect)
    // the run really was incremental: >= 2 micro-batches hit the ledger,
    // and the first batch saw only part of the vocabulary (update mode)
    val ledger = spark.read.parquet(
      s"/tmp/graft_stream/q187_${java.nio.file.Paths.get(sf).getFileName}/ledger")
    val batches = ledger.select(col("b")).distinct().count()
    assert(batches >= 2, s"expected >=2 micro-batches, got $batches")
    val firstKeys = ledger.filter(col("b") === 0)
      .select(col("w1"), col("w2")).distinct().count()
    val allKeys = ledger.select(col("w1"), col("w2")).distinct().count()
    assert(firstKeys < allKeys,
      "update mode should not emit the whole vocabulary in batch 0")
  }

  test("round-9 training-prep windows stay keyed") {
    // q180 partitions by lang, q182 by query_id, q183 by doc_id — an
    // unkeyed window would serialize the corpus through one task.
    // (q181's window IS global by design: it ranks a 10-row post-limit
    // set, the q129 exemption.)
    for (name <- Seq("q180_preference_pairs", "q182_late_interaction_batch",
        "q183_chat_sft_prep")) {
      val plan = SparkEntry.registry.find(_.name == name).get
        .run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$name plans an unkeyed window:\n$plan")
    }
  }

  test("q181: flags agree with an independent full-precision top-k") {
    val got = byName("q181_matryoshka_recall").cache()
    assert(got.count() == 10)
    assert(got.agg(max(col("trunc_rank"))).head.getLong(0) == 10L)
    val fullIds = byName("q23_similarity_topk_brute")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val flagged = got.filter(col("in_full_topk"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val unflagged = got.filter(!col("in_full_topk"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(fullIds))
    assert(unflagged.intersect(fullIds).isEmpty)
    got.unpersist()
  }
}
