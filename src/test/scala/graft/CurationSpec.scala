package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.tables.Catalog

/** Round-9 corpus-curation additions: CCNet perplexity buckets (q188),
  * DSIR importance resampling (q189), T5 span corruption (q190),
  * in-engine classifier training (q191), PCA power iteration (q192),
  * and the curriculum schedule (q193). Each test pins the SEMANTIC
  * property the operator exists for, not the oracle hash (the
  * correctness gate owns that).
  */
class CurationSpec extends SparkSuite {

  private def byName(n: String) =
    SparkEntry.registry.find(_.name == n).get.run(spark, sf)

  test("q188: buckets are value-monotone per language and cover all scored docs") {
    val got = byName("q188_ccnet_buckets").cache()
    // value-threshold buckets: every head score < every middle score
    // < every tail score within a language (strict at milli granularity)
    val m = got.groupBy(col("lang")).agg(
      max(when(col("ppl_bucket") === "head", col("nll_micro") / 1000))
        .as("h_max"),
      min(when(col("ppl_bucket") === "middle", col("nll_micro") / 1000))
        .as("m_min"),
      max(when(col("ppl_bucket") === "middle", col("nll_micro") / 1000))
        .as("m_max"),
      min(when(col("ppl_bucket") === "tail", col("nll_micro") / 1000))
        .as("t_min")).collect()
    m.foreach { r =>
      if (!r.isNullAt(1) && !r.isNullAt(2))
        assert(r.getDouble(1) <= r.getDouble(2) + 1, r.toString)
      if (!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getDouble(3) <= r.getDouble(4) + 1, r.toString)
    }
    // one row per multi-token doc, same coverage as q178
    assert(got.count() == byName("q178_bigram_perplexity").count())
    got.unpersist()
  }

  test("q189: keep set is a weight superlevel set covering >= 20% of docs") {
    val got = byName("q189_dsir_importance").cache()
    val total = got.count()
    val kept = got.filter(col("keep") === 1).cache()
    assert(kept.count() * 5 >= total, s"${kept.count()} of $total kept")
    val minKept = kept.agg(min(col("lw_micro"))).head().getLong(0)
    // threshold at milli granularity: no dropped doc may exceed the
    // lowest kept weight by a full milli step
    val overs = got.filter(col("keep") === 0)
      .filter(col("lw_micro") >= minKept + 1000).count()
    assert(overs == 0)
    kept.unpersist(); got.unpersist()
  }

  test("q190: sentinel substitution reconstructs the original token stream") {
    val rows = byName("q190_span_corruption")
      .join(Catalog.documents(spark, sf), Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("input_str"),
        col("target_str"), col("text")).collect()
    assert(rows.nonEmpty)
    val sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { r =>
      val (nSpans, input, target, text) =
        (r.getLong(1), r.getString(2), r.getString(3), r.getString(4))
      // parse target: sentinel k -> hidden tokens
      val spans = scala.collection.mutable.Map[Int, Seq[String]]()
      var cur = -1
      target.split("\\s+").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Seq.empty
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.size == nSpans, s"doc ${r.getLong(0)}")
      assert(spans.keys.toSeq.sorted == (0 until nSpans.toInt),
        s"doc ${r.getLong(0)}: sentinel ordinals not contiguous")
      val rebuilt = input.split("\\s+").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      val orig = text.split("\\s+").filter(_.nonEmpty).toSeq
      assert(rebuilt.toSeq == orig, s"doc ${r.getLong(0)} reconstruction")
    }
  }

  test("q191: trained classifier separates the target language") {
    val got = byName("q191_quality_classifier").cache()
    val m = got.groupBy(col("y")).agg(avg(col("p_micro")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) > m(0L),
      s"mean p(en)=${m(1L)} must exceed mean p(other)=${m(0L)}")
    // the model must have moved off the 0.5 init for at least one class
    assert(got.filter(col("p_micro") =!= 500000).count() > 0)
    got.unpersist()
  }

  test("q192: component is unit-norm and beats the uniform direction") {
    val rows = byName("q192_pca_power_iteration").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length == 64)
    val v = rows.map(_._3.toDouble / 1e6)
    val mu = rows.map(_._2.toDouble / 1e6)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 0.02, s"norm $norm")
    // Rayleigh quotient v'Cv must beat the uniform init's — the
    // iteration made progress toward the leading eigenvector
    val data = Catalog.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def rayleigh(dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      val u = dir.map(_ / n)
      data.map { x =>
        val dot = x.indices.map(i => (x(i) - mu(i)) * u(i)).sum
        dot * dot
      }.sum
    }
    val uniform = Array.fill(64)(1.0)
    assert(rayleigh(v) >= rayleigh(uniform) * 0.999,
      s"rayleigh ${rayleigh(v)} vs uniform ${rayleigh(uniform)}")
  }

  test("q194: collision histogram bounds the true LSH candidate-pair count") {
    val stats = byName("q194_lsh_collision_stats").collect()
    val estPairs = stats.map(r => r.getLong(2)).sum
    val truePairs = byName("q19_dedup_minhash_lsh").count()
    // Σ C(size,2) counts each candidate pair once PER shared bucket —
    // an upper bound on the distinct-pair count q19 materializes
    assert(estPairs >= truePairs, s"$estPairs < $truePairs")
    assert(truePairs > 0 && estPairs > 0)
    // histogram is consistent: pairs = buckets * C(size,2) per row
    stats.foreach { r =>
      val (sz, nb, cp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(cp == nb * sz * (sz - 1) / 2, r.toString)
    }
  }

  test("q195: numbered variants cluster by template, not by exact text") {
    val got = byName("q195_template_dedup").cache()
    // every 7th doc got two variants with DIFFERENT numbers — same
    // template → a cluster with 2 members but 2 distinct texts
    // (doc 0 is the exception: 0·7 = 0·13, so its variants are
    // byte-identical — 2 members, 1 distinct text)
    val variantClusters = got.filter(col("n_members") === 2)
    val expected = Catalog.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).count()
    assert(variantClusters.count() == expected)
    assert(variantClusters.filter(col("n_distinct_texts") === 2).count()
      == expected - 1)
    // keep_id is the minimum member id: variants keep the +2000000 copy
    assert(variantClusters.filter(col("keep_id") < 2000000).count() == 0)
    got.unpersist()
  }

  test("q196: novelty is a valid ppm ratio and unique docs score high") {
    val got = byName("q196_ngram_novelty").cache()
    assert(got.filter(col("novel_ppm") < 0 || col("novel_ppm") > 1000000)
      .count() == 0)
    assert(got.filter(col("n_novel") > col("n_sh")).count() == 0)
    // novel_ppm = (n_novel * 1e6) div n_sh exactly
    assert(got.filter(expr("novel_ppm != (n_novel * 1000000) div n_sh"))
      .count() == 0)
    got.unpersist()
  }

  test("q193: positions are dense per (phase, shard) and phases are difficulty-monotone") {
    val got = byName("q193_curriculum_schedule").cache()
    // pos is 1..count within each (phase, shard)
    val bad = got.groupBy(col("phase"), col("shard"))
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1).count()
    assert(bad == 0)
    // phases ordered by difficulty: max nll of phase p stays within a
    // milli step of min nll of phase p+1
    val withNll = got.join(
      byName("q178_bigram_perplexity").select(col("doc_id"),
        col("nll_micro")), Seq("doc_id"))
    val stats = withNll.groupBy(col("phase"))
      .agg(min(col("nll_micro")).as("mn"), max(col("nll_micro")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    stats.sliding(2).foreach {
      case Array((_, _, loMx), (_, hiMn, _)) =>
        assert(loMx <= hiMn + 1000, s"phases overlap: $loMx vs $hiMn")
      case _ =>
    }
    got.unpersist()
  }

  test("q197: injected structure drives exactly the intended rule verdicts") {
    val got = byName("q197_gopher_rules").cache()
    val total = Catalog.documents(spark, sf).count()
    assert(got.count() == total)
    // pure-bullet docs (%66): 10 lines, all bullets -> fail bullet rule
    // and the conjunction
    val bullets = got.filter(col("doc_id") % 66 === 0).cache()
    assert(bullets.filter(col("r_bullet_lines") =!= 0 ||
      col("gopher_pass") =!= 0 || col("n_lines") =!= 10).count() == 0)
    // ellipsis docs (%13, not %66): 2 of <=5 lines ellipsis-ended -> fail
    val expectEll = got.filter(col("doc_id") % 13 === 0 &&
      col("doc_id") % 66 =!= 0)
    assert(expectEll.filter(col("r_ellipsis_lines") =!= 0).count() == 0)
    // and nobody else fails the ellipsis rule
    assert(got.filter(col("r_ellipsis_lines") === 0).count() ==
      expectEll.count())
    // conjunction is the product of the flags
    assert(got.filter(expr("gopher_pass != r_word_count * r_mean_word_len" +
      " * r_symbol_ratio * r_bullet_lines * r_ellipsis_lines" +
      " * r_alpha_words * r_stop_words")).count() == 0)
    bullets.unpersist(); got.unpersist()
  }

  test("q198: every injected benchmark copy is flagged at cosine ~1") {
    val got = byName("q198_semantic_decontaminate").cache()
    val benchIds = Catalog.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).select(col("vec_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val flagged = got.select(col("vec_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // the bench vectors themselves (self-match) and the shifted copies
    benchIds.foreach(b => assert(flagged.contains(b), s"bench $b unflagged"))
    benchIds.filter(_ % 100 == 0).foreach(b =>
      assert(flagged.contains(b + 200000L), s"copy of $b unflagged"))
    assert(got.filter(col("vec_id") >= 200000L)
      .filter(col("max_cosine") < 0.999).count() == 0)
    got.unpersist()
  }

  test("q199: sketch estimate tracks exact Jaccard within KMV error") {
    val got = byName("q199_corpus_overlap").cache()
    assert(got.count() > 0)
    // k_eff = min(k, union size); intersection never exceeds it
    assert(got.filter(col("k_eff") =!=
      least(lit(256L), col("union_exact"))).count() == 0)
    assert(got.filter(col("inter_k") > col("k_eff")).count() == 0)
    // KMV standard error ~1/sqrt(256) ~ 6.3ppt; allow 4 sigma
    assert(got.filter(abs(col("est_ppm") - col("exact_ppm")) > 250000)
      .count() == 0)
    got.unpersist()
  }

  test("q199: the 62-source bitmap boundary fails loudly, not silently") {
    val s = spark; import s.implicits._
    // 62 sources: every sid 0..61 fits the single-BIGINT mask
    val ok = graft.queries.DedupQueries.maskSourceIds(
      (0 until 62).map(i => f"src_$i%03d").toDF("source"))
    assert(ok.agg(max(col("sid"))).head().getInt(0) == 61)
    // a 63rd source would alias a low bit under shiftleft's mod-64
    // wrap — the guard must raise instead of corrupting intersections
    val boom = intercept[Exception] {
      graft.queries.DedupQueries.maskSourceIds(
        (0 until 63).map(i => f"src_$i%03d").toDF("source"))
        .agg(max(col("sid"))).head()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(boom).exists(_.contains("multi-word masks")), boom.toString)
  }

  test("q200: split summary is a partition of the corpus, clusters atomic") {
    val got = byName("q200_leakage_safe_split").cache()
    val docs = Catalog.documents(spark, sf).count()
    val corpus = docs + Catalog.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).count()
    assert(got.agg(sum(col("n_docs"))).head().getLong(0) == corpus)
    val splits = got.select(col("split"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(got.filter(col("n_multi_clusters") > col("n_clusters"))
      .count() == 0)
    // near-dup injection guarantees multi-doc clusters exist somewhere
    assert(got.agg(sum(col("n_multi_clusters"))).head().getLong(0) > 0)
    got.unpersist()
  }

  test("q202: KN scores cover exactly q178's docs with positive nll") {
    val kn = byName("q202_kneser_ney_perplexity").cache()
    val jm = byName("q178_bigram_perplexity")
      .select(col("doc_id"), col("n_bigrams").as("nb_jm"))
    // same bigram extraction -> same coverage and same bigram counts
    assert(kn.join(jm, "doc_id")
      .filter(col("n_bigrams") =!= col("nb_jm")).count() == 0)
    assert(kn.count() == jm.count())
    // a probability < 1 per bigram -> strictly positive mean nll
    assert(kn.filter(col("nll_kn_micro") <= 0).count() == 0)
    kn.unpersist()
  }

  test("q203: every injected near-dup pair is recalled; ppm bounds hold") {
    val r = byName("q203_dedup_recall_audit").head()
    val (nTruth, nCand, nHit) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHit <= math.min(nTruth, nCand))
    // the injection appends 4 tokens to a ~50-token doc (Jaccard ~0.9);
    // at 8 sigs x 4 bands the collision probability is ~1 — anything
    // below full recall means the signature pipeline regressed
    assert(r.getLong(4) == 1000000L, s"recall_ppm = ${r.getLong(4)}")
    assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L)
  }

  test("q204: measured LSH catch rate tracks the analytic S-curve") {
    val got = byName("q204_lsh_scurve_calibration").cache()
    // high-similarity deciles: the banded index must catch essentially
    // everything the theory promises (>=90% there)
    assert(got.filter(col("decile") >= 7)
      .filter(col("caught_ppm") < 900000).count() == 0)
    // low-similarity deciles: collisions must stay rare
    assert(got.filter(col("decile") <= 1)
      .filter(col("caught_ppm") > 150000).count() == 0)
    assert(got.filter(col("theory_ppm") < 0 ||
      col("theory_ppm") > 1000000).count() == 0)
    got.unpersist()
  }

  test("q205: AUC is consistent with q191's scores and at least random") {
    val r = byName("q205_classifier_auc").head()
    val (nPos, nNeg, nScores, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val sc = byName("q191_quality_classifier").cache()
    assert(nPos == sc.filter(col("y") === 1).count())
    assert(nPos + nNeg == sc.count())
    assert(nScores <= sc.count())
    assert(auc >= 500000L && auc <= 1000000L, s"auc_ppm = $auc")
    // exact tie-corrected AUC equals the pair-counting definition on a
    // small independent recomputation: P(score_pos > score_neg) + ½ties
    val rows = sc.select(col("y"), col("p_micro"))
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1)))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val num2 = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(auc == num2 * 1000000L / (2L * pos.length * neg.length))
    sc.unpersist()
  }

  test("q206: multi-probe recall dominates single-probe at the same index") {
    def ids(n: String) = byName(n).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val brute = ids("q23_similarity_topk_brute")
    val single = ids("q56_similarity_ann_lsh")
    val multi = ids("q206_multiprobe_lsh")
    assert((multi & brute).size >= (single & brute).size,
      s"multi ${(multi & brute).size} < single ${(single & brute).size}")
    // probing 3 of 16 buckets must strictly improve on this corpus
    assert((multi & brute).size > (single & brute).size)
    // single-probe results are a subset of multi-probe candidates' top-k
    // universe: the base bucket is always probed
    assert(multi.size == 10 && single.size == 10)
  }

  test("q207: PSI is non-negative and detects the parity-correlated feature") {
    val got = byName("q207_drift_psi").cache()
    assert(got.count() == 3)
    // PSI terms (p-q)ln(p/q) are sign-aligned -> the sum is >= 0
    assert(got.filter(col("psi_micro") < 0).count() == 0)
    val psi = got.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // sources are assigned round-robin by doc_id, so the parity split
    // IS a source shift; language is independent of parity
    assert(psi("source") > psi("lang") * 10,
      s"source drift must dominate: $psi")
    got.unpersist()
  }
}
