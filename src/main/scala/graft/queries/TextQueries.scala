package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._
import graft.tables.Catalog

/** Text-analysis operators over the `documents` table as verifiable
  * queries. The DuckDB oracle SQL for the language-ID scores is GENERATED
  * from the same `TextAnalysis.langMarkers` declaration the Spark side
  * uses, so the two can never drift.
  */
object TextQueries {

  // ---- SQL fragments generated from the shared declarations ----

  /** (length(p)-length(replace(p,m,'')))/len(m) — same arithmetic as
    * TextAnalysis.occurrences. */
  private def occSql(padded: String, m: String): String =
    s"(length($padded) - length(replace($padded, '$m', ''))) / ${m.length}"

  private val tokSql = """len(regexp_split_to_array(text, '\s+'))"""

  private def scoreSql(markers: Seq[String]): String = {
    val hits = markers.map(m => occSql("p.padded", m)).mkString(" + ")
    s"CAST($hits AS DOUBLE) / nullif(CAST($tokSql AS DOUBLE), 0)"
  }

  private[graft] val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))"""

  /** 60-bit md5-derived hash — same as TextAnalysis.hash60. */
  def hash60Sql(s: String): String =
    s"CAST(('0x' || substr(md5($s), 1, 15)) AS BIGINT)"

  // ---- queries ----

  /** q14 — token counting: whitespace tokens + BPE-ish pre-tokenizer. */
  val q14 = Q("q14_token_stats",
    (s, d) => Catalog.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).cast("bigint").as("n_tokens"),
      bpeishTokenCount(col("text")).cast("bigint").as("n_bpeish"),
      col("n_chars"),
      meanWordLen(col("text")).as("mean_word_len")),
    Some(
      s"""SELECT doc_id,
         |  CAST($tokSql AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
         |  n_chars,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / nullif(CAST($tokSql AS DOUBLE), 0) AS mean_word_len
         |FROM documents""".stripMargin))

  /** q15 — language-ID heuristic: marker-hit scores per language, argmax
    * with first-wins tie-break. */
  val q15 = {
    val scoreCols = langMarkers.map { case (l, ms) =>
      (l, s"score_$l", scoreSql(ms))
    }
    val bestSql = s"greatest(${scoreCols.map(_._2).mkString(", ")})"
    val caseSql = scoreCols.map { case (l, c, _) =>
      s"WHEN $c = best AND $c > 0 THEN '$l'"
    }.mkString(" ")
    Q("q15_lang_id",
      (s, d) => {
        val scored = langMarkers.foldLeft(Catalog.documents(s, d)) {
          case (df, (l, ms)) =>
            df.withColumn(s"score_$l", langScore(col("text"), ms))
        }
        scored.select(col("doc_id") +: col("lang").as("labeled_lang") +:
          langMarkers.map { case (l, _) => col(s"score_$l") } :+
          predictedLang(col("text")).as("predicted_lang"): _*)
      },
      Some(
        s"""WITH p AS (SELECT *, ' ' || text || ' ' AS padded FROM documents),
           |scored AS (SELECT doc_id, lang AS labeled_lang,
           |  ${scoreCols.map { case (_, c, e) => s"$e AS $c" }.mkString(",\n  ")}
           |FROM p),
           |b AS (SELECT *, $bestSql AS best FROM scored)
           |SELECT doc_id, labeled_lang, ${scoreCols.map(_._2).mkString(", ")},
           |  CASE $caseSql ELSE 'und' END AS predicted_lang
           |FROM b""".stripMargin))
  }

  /** q16 — quality scoring: char-class ratios + composite + bucket.
    * Components are materialized as columns once, then composed by
    * reference — inlining the full trees into the composite triples the
    * generated code and can push the codegen'd method past the JIT size
    * limit (observed ~10× slowdown). */
  val q16 = Q("q16_quality_score",
    (s, d) => Catalog.documents(s, d).select(
      col("doc_id"),
      alphaRatio(col("text")).as("alpha_ratio"),
      stopwordRatio(col("text")).as("stopword_ratio"),
      least(tokenCount(col("text")).cast("double") / 100.0, lit(1.0))
        .as("len_score"))
      .select(col("doc_id"), col("alpha_ratio"), col("stopword_ratio"),
        (col("len_score") * 0.3 + col("alpha_ratio") * 0.4 +
          least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3)
          .as("quality_score"))
      .withColumn("quality_bucket",
        when(col("quality_score") >= 0.7, "high")
          .when(col("quality_score") >= 0.4, "medium")
          .otherwise("low")),
    Some {
      val stopHits = langMarkers.head._2
        .map(m => occSql("(' ' || text || ' ')", m)).mkString(" + ")
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         |      / nullif(CAST(length(text) AS DOUBLE), 0) AS alpha_ratio,
         |    CAST($stopHits AS DOUBLE)
         |      / nullif(CAST($tokSql AS DOUBLE), 0) AS stopword_ratio,
         |    least(CAST($tokSql AS DOUBLE) / 100.0, 1.0) AS len_score
         |  FROM documents)
         |SELECT doc_id, alpha_ratio, stopword_ratio,
         |  len_score * 0.3 + alpha_ratio * 0.4
         |    + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score,
         |  CASE WHEN len_score * 0.3 + alpha_ratio * 0.4
         |            + least(stopword_ratio * 5.0, 1.0) * 0.3 >= 0.7 THEN 'high'
         |       WHEN len_score * 0.3 + alpha_ratio * 0.4
         |            + least(stopword_ratio * 5.0, 1.0) * 0.3 >= 0.4 THEN 'medium'
         |       ELSE 'low' END AS quality_bucket
         |FROM q""".stripMargin
    })

  /** q17 — document fingerprints: md5 of normalized text + 60-bit int. */
  val q17 = Q("q17_fingerprint",
    (s, d) => Catalog.documents(s, d).select(
      col("doc_id"),
      fingerprintMd5(col("text")).as("fp_md5"),
      hash60(normalizeText(col("text"))).as("fp60")),
    Some(
      s"""SELECT doc_id, md5($normSql) AS fp_md5,
         |  ${hash60Sql(normSql)} AS fp60
         |FROM documents""".stripMargin))

  /** q62 — PII redaction: scrub URLs, emails, and long digit runs to
    * typed placeholders (the standard pre-training cleaning pass). The
    * corpus deterministically injects one of each per doc (the testdata
    * has no PII — same injection in the oracle, which defines the
    * contract); per-type match counts are taken PRE-redaction. The regex
    * set is alternation-free so Java regex and RE2 agree (see
    * [[graft.ops.TextAnalysis.redactPii]]); the same pattern strings
    * generate both sides, so they cannot drift. */
  val q62 = {
    import graft.ops.TextAnalysis.{urlRe, emailRe, longNumRe, redactPii}
    // the Scala pattern strings interpolate into SQL single-quoted
    // literals verbatim — DuckDB string literals keep backslashes as-is
    Q("q62_pii_redaction",
      (s, d) => Catalog.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via "),
            lit("https://ex.org/d/"), col("doc_id").cast("string"),
            lit(" or call 55512"),
            ((col("doc_id") % 100000L) + 10000L).cast("string"))
            .as("text"))
        .select(col("doc_id"),
          redactPii(col("text")).as("clean"),
          size(regexp_extract_all(col("text"), lit(urlRe), lit(0)))
            .cast("bigint").as("n_url"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .cast("bigint").as("n_email"),
          size(regexp_extract_all(col("text"), lit(longNumRe), lit(0)))
            .cast("bigint").as("n_num")),
      Some(
        s"""WITH corpus AS (
           |  SELECT doc_id,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR)
           |      || '@example.com via https://ex.org/d/'
           |      || CAST(doc_id AS VARCHAR)
           |      || ' or call 55512' || CAST(doc_id % 100000 + 10000 AS VARCHAR)
           |      AS text
           |  FROM documents)
           |SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '$urlRe', '<URL>', 'g'),
           |    '$emailRe', '<EMAIL>', 'g'),
           |    '$longNumRe', '<NUM>', 'g') AS clean,
           |  CAST(len(regexp_extract_all(text, '$urlRe')) AS BIGINT)
           |    AS n_url,
           |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT)
           |    AS n_email,
           |  CAST(len(regexp_extract_all(text, '$longNumRe')) AS BIGINT)
           |    AS n_num
           |FROM corpus""".stripMargin))
  }

  /** q66 — unigram log-probability scoring (the cheap perplexity-filter
    * analog): corpus unigram frequencies → per-doc mean log2 P(token),
    * the standard LM-based quality signal before real-perplexity
    * filtering. The mean is quantized to micro units
    * (round(x·10⁶)::bigint) because log2 is the one function here
    * without a cross-engine correctly-rounded guarantee — the ~1-ulp
    * libm drift is 9 orders below the quantum.
    *
    * Scale shape: unigram counts come from the STORED LM count table
    * ([[graft.ops.LmCounts]] — trained once per corpus generation,
    * shared with q178/q202); the per-doc score is one groupBy(doc_id)
    * after an inverted-index join of (doc_id, token) against the
    * vocab-sized count relation — one corpus scan, both shuffles
    * keyed, nothing corpus². */
  val q66 = Q("q66_unigram_logprob",
    (s, d) => {
      val (_, cuStore) = graft.ops.LmCounts.stored(s, d)
      val toks = Catalog.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      val counts = cuStore.select(col("w").as("token"), col("cu").as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("n")) // 1 row
      toks.join(counts, "token").crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_tokens"),
          round(avg(log2(col("cnt").cast("double") / col("n").cast("double")))
            * 1e6).cast("bigint").as("mean_log2p_micro"))
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id, u.token
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |        FROM documents) d, unnest(d.t) u(token)),
        |counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
        |total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM counts)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(round(avg(log2(CAST(cnt AS DOUBLE) / n)) * 1000000)
        |    AS BIGINT) AS mean_log2p_micro
        |FROM toks JOIN counts USING (token), total
        |GROUP BY doc_id""".stripMargin))

  /** q75 — OUTER explode: docs keep a row (NULL pos/token) when their
    * long-token array is empty — posexplode_outer vs plain posexplode,
    * which silently drops such parents (the classic lost-rows bug in
    * flattening pipelines). The oracle reconstructs outer semantics as
    * unnest ∪ empty-array parents. */
  val q75 = Q("q75_outer_explode",
    (s, d) => Catalog.documents(s, d)
      .select(col("doc_id"),
        filter(tokens(col("text")), t => length(t) > 9).as("longs"))
      .select(col("doc_id"), posexplode_outer(col("longs")))
      .select(col("doc_id"), col("pos").cast("bigint").as("p"),
        col("col").as("token")),
    Some(
      """WITH la AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      t -> length(t) > 9) AS longs
        |  FROM documents)
        |SELECT doc_id, CAST(p - 1 AS BIGINT) AS p, longs[p] AS token
        |FROM (SELECT doc_id, longs,
        |        unnest(generate_series(1, len(longs))) AS p
        |      FROM la WHERE len(longs) > 0)
        |UNION ALL
        |SELECT doc_id, NULL, NULL FROM la WHERE len(longs) = 0""".stripMargin))

  /** q103 — ACCENT FOLDING via the custom codegen expression
    * [[graft.functions.FoldAccents]] (NFD + strip combining marks — the
    * standard normalization pass before multilingual dedup). The corpus
    * text is ASCII, so each doc is suffixed with a fixed accented probe
    * string to force real decomposition work; the oracle is DuckDB's
    * utf8proc-backed `strip_accents`, so hash-green proves the JVM
    * normalizer and utf8proc agree byte-for-byte. Folding changes the
    * fingerprint — the pre/post hash pair shows the collision effect
    * dedup relies on. */
  val q103 = {
    val probe = " Résumé żółć café naïve Zürich mañana ÀÉÎÕÜ pâté"
    Q("q103_fold_accents",
      (s, d) => {
        val withProbe = concat(col("text"), lit(probe))
        Catalog.documents(s, d).select(col("doc_id"),
          graft.functions.FoldAccents(withProbe).as("folded"),
          hash60(withProbe).as("h_raw"),
          hash60(graft.functions.FoldAccents(withProbe)).as("h_folded"))
      },
      Some {
        val withProbe = s"text || ' ${probe.trim}'"
        s"""SELECT doc_id, strip_accents($withProbe) AS folded,
           |  ${hash60Sql(withProbe)} AS h_raw,
           |  ${hash60Sql(s"strip_accents($withProbe)")} AS h_folded
           |FROM documents""".stripMargin
      })
  }

  /** q109 — BM25 RANKED RETRIEVAL: the classic keyword-search scorer
    * (Robertson k1=1.2, b=0.75) over the documents table, top 10 docs
    * for a 3-term query. Shapes for 100 TB: per-doc token explode is
    * filtered to the QUERY TERMS before the tf aggregation (the shuffle
    * carries only matching postings, not the corpus vocabulary);
    * corpus-level stats (N, avgdl) are a 2-value broadcast; the final
    * top-k is a TakeOrdered, never a global sort. Scores are
    * micro-quantized bigints (ln is the one non-correctly-rounded libm
    * call) with doc_id tiebreak — a total order, so the LIMIT set is
    * deterministic in both engines. */
  /** The shared 3-term query for the retrieval family (q109 BM25,
    * q169 RRF fusion via q109, q212 cross-encoder rerank). */
  private[queries] val bm25Terms = Seq("vector", "merge", "stream")

  /** BM25-scored docs (doc_id, score_micro), pre-ranking — factored so
    * q109 (top 10) and q212's candidate stage (top 50) share one
    * implementation and can never drift. */
  private def bm25Ranked(s: SparkSession, d: String): DataFrame = {
    val terms = bm25Terms
    val k1 = "1.2"
    val b = "0.75"
    val docs = Catalog.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("dl", size(col("toks")).cast("bigint"))
        val stats = docs.agg(
          count(lit(1)).cast("bigint").as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
            .as("avgdl"))
        val tf = docs
          .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
          .filter(col("t").isInCollection(terms))
          .groupBy(col("doc_id"), col("dl"), col("t"))
          .agg(count(lit(1)).cast("bigint").as("tf"))
        val dfreq = tf.groupBy(col("t"))
          .agg(count(lit(1)).cast("bigint").as("df"))
        val scored = tf.join(broadcast(dfreq), "t")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), col("t"),
            (log((col("n_docs").cast("double") - col("df").cast("double")
              + lit(0.5)) / (col("df").cast("double") + lit(0.5)) + lit(1.0))
              * (col("tf").cast("double") * lit(k1.toDouble + 1.0))
              / (col("tf").cast("double") + lit(k1.toDouble)
                * (lit(1.0 - b.toDouble) + lit(b.toDouble)
                  * col("dl").cast("double") / col("avgdl"))))
              .as("part"))
        // fixed-order term sum (p0 + p1 + p2), never sum(double) — the
        // accumulation order is part of the result contract
        val perTerm = terms.zipWithIndex.map { case (t, i) =>
          coalesce(max(when(col("t") === t, col("part"))), lit(0.0)).as(s"p$i")
        }
    scored.groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        round(terms.indices.map(i => col(s"p$i")).reduce(_ + _) * 1e6)
          .cast("bigint").as("score_micro"))
  }

  /** Oracle side of [[bm25Ranked]] + ranking, parameterized on the
    * result size (q109 embeds 10; q212's candidate CTE embeds 50). */
  private def bm25OracleSql(limit: Int): String = {
    val terms = bm25Terms
    val k1 = "1.2"
    val b = "0.75"
    val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    val tokSqlArr = """regexp_split_to_array(text, '\s+')"""
    s"""WITH d AS (SELECT doc_id, $tokSqlArr AS toks FROM documents),
           |dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
           |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |            CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |              AS avgdl
           |          FROM dd),
           |tf AS (SELECT doc_id, dl, u.t, CAST(count(*) AS BIGINT) AS tf
           |       FROM dd, unnest(dd.toks) AS u(t)
           |       WHERE list_contains($termList, u.t)
           |       GROUP BY 1, 2, 3),
           |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           |scored AS (
           |  SELECT doc_id, t,
           |    ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
           |        / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
           |      * (CAST(tf AS DOUBLE) * (1.0 + $k1))
           |      / (CAST(tf AS DOUBLE) + $k1
           |        * ((1.0 - $b) + $b * CAST(dl AS DOUBLE) / avgdl)) AS part
           |  FROM tf JOIN df USING (t), stats),
           |byterm AS (
           |  SELECT doc_id,
           |    ${terms.zipWithIndex.map { case (t, i) =>
                  s"COALESCE(max(CASE WHEN t = '$t' THEN part END), 0.0) AS p$i"
                }.mkString(",\n    ")}
           |  FROM scored GROUP BY 1)
           |SELECT doc_id,
           |  CAST(round((${terms.indices.map(i => s"p$i").mkString(" + ")})
           |    * 1e6) AS BIGINT) AS score_micro
           |FROM byterm
           |ORDER BY score_micro DESC, doc_id
           |LIMIT $limit""".stripMargin
  }

  val q109 = Q("q109_bm25_search",
    (s, d) => bm25Ranked(s, d)
      .orderBy(col("score_micro").desc, col("doc_id").asc).limit(10),
    Some(bm25OracleSql(10)))

  /** q118 — VOCABULARY INDUCTION + OOV ACCOUNTING: the tokenizer-prep
    * pass — induce the top-200 corpus vocabulary (count-ranked,
    * token-tiebroken so the cut is deterministic in both engines) and
    * measure per-language out-of-vocabulary rates against it. The OOV
    * rate is parts-per-million via exact integer division — no FP. The
    * vocab is dimension-sized by construction, so membership is a
    * broadcast left join against the token stream (never a shuffle of
    * the corpus); counts and the vocab cut are one map-side-combined
    * groupBy each. This is the coverage report that decides vocab size
    * / byte-fallback policy before committing to a tokenizer. */
  val q118 = Q("q118_vocab_oov",
    (s, d) => {
      val toks = Catalog.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(200)
        .select(col("token"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("in_v").isNull, 1)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
    },
    Some(
      """WITH toks AS (
        |  SELECT lang, u.token
        |  FROM (SELECT lang, regexp_split_to_array(text, '\s+') AS t
        |        FROM documents) d, unnest(d.t) u(token)),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS cnt FROM toks
        |    GROUP BY 1 ORDER BY cnt DESC, token LIMIT 200)),
        |j AS (
        |  SELECT lang, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks LEFT JOIN vocab v USING (token))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  (CAST(sum(oov) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |    AS oov_ppm
        |FROM j GROUP BY 1""".stripMargin))

  /** q136 — BPE SUBWORD TOKEN ACCOUNTING: per-doc token count under
    * the pinned 1024-rule LEARNED merge table ([[graft.ops.Bpe]]) —
    * the number a training pipeline actually budgets by (context
    * packing, mixture quotas), where q14's whitespace count is only a
    * proxy. The oracle replays the IDENTICAL table as a batched
    * nested-replace CTE chain per document: one declaration, two
    * engines. Narrow map-side transform — at 100 TB this runs at scan
    * speed, column-pruned to (doc_id, text), O(len × merges_fired) per
    * row independent of vocabulary size. */
  val q136 = Q("q136_bpe_tokens",
    (s, d) => Catalog.documents(s, d).select(
      col("doc_id"),
      graft.ops.Bpe.tokenCount(col("text")).cast("bigint").as("n_bpe"),
      length(normalizeText(col("text"))).cast("bigint").as("n_norm_chars")),
    Some(
      s"""WITH ${graft.ops.Bpe.dtFixtureCte}
         |SELECT doc_id, n_bpe,
         |  CAST(length($normSql) AS BIGINT) AS n_norm_chars
         |FROM documents JOIN dt USING (doc_id)""".stripMargin))

  /** q137 — BPE VOCABULARY USAGE: explode the subword stream, count
    * each token's corpus frequency, keep the top 50 (count desc, token
    * asc — total order, hash-stable). The aggregation is a map-side
    * combinable groupBy on a bounded key domain (≤ |chars| + |merges|
    * symbols), so at 100 TB it collapses per-partition before the one
    * small shuffle. */
  val q137 = Q("q137_bpe_vocab",
    (s, d) => graft.ops.Bpe.storedTokens(s, d)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(50),
    Some(
      s"""WITH ${graft.ops.Bpe.dtFixtureCte},
         |occ AS (SELECT u.tok FROM dt, unnest(dt.toks) u(tok))
         |SELECT tok AS token, count(*) AS n FROM occ
         |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin))

  /** q155 — COMPRESSION-RATIO QUALITY SIGNAL: normalized chars per BPE
    * token, per document, rolled up per source — the classic
    * "compressibility" quality heuristic (Gopher/C4-family filters):
    * text the corpus tokenizer compresses POORLY (low chars/token —
    * rare character soup the merge table has no rules for) is unusual
    * relative to the training distribution and gets flagged. Exact
    * arithmetic end to end: the per-doc ratio is an integer ppm
    * (1e6 · chars ÷ tokens, integer division), the roll-up sums those
    * exactly, and the low-quality flag is an integer threshold — no
    * doubles, no accumulation-order hazard. Scale: one narrow map-side
    * tokenize + one combinable groupBy(source). */
  val q155 = Q("q155_compression_quality",
    (s, d) => Catalog.documents(s, d)
      .select(col("doc_id"), col("source"),
        length(normalizeText(col("text"))).cast("bigint").as("n_chars"))
      .join(graft.ops.Bpe.storedTokens(s, d)
        .select(col("doc_id"), col("n_bpe")), "doc_id")
      .filter(col("n_bpe") > 0)
      .withColumn("ratio_ppm",
        expr("(1000000 * n_chars) div n_bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ratio_ppm")).cast("bigint").as("sum_ratio_ppm"),
        sum(when(col("ratio_ppm") < 9000000L, 1L).otherwise(0L))
          .cast("bigint").as("n_low_quality")),
    Some(
      s"""WITH ${graft.ops.Bpe.dtFixtureCte},
         |r AS (SELECT d.source,
         |        (1000000 * CAST(length($normSql) AS BIGINT)) // dt.n_bpe
         |          AS ratio_ppm
         |      FROM documents d JOIN dt USING (doc_id)
         |      WHERE dt.n_bpe > 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ratio_ppm) AS BIGINT) AS sum_ratio_ppm,
         |  CAST(sum(CASE WHEN ratio_ppm < 9000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_low_quality
         |FROM r GROUP BY 1""".stripMargin))

  /** q162 — BPE TOKENIZATION ANCHOR: the full (doc_id, token count,
    * ordered token list) table under the pinned merges, hash-compared
    * against the DuckDB oracle's complete nested-replace REPLAY of the
    * same table. This is the ONE query whose oracle still pays the
    * full per-document replay cost — it anchors the shared fixture
    * ([[graft.ops.Bpe.dtFixturePath]]) every other BPE-dependent
    * oracle reads: green here means the materialized tokenization is
    * bit-identical to an independent engine's replay, token lists
    * included (the '|' join is injective — the alphabet is
    * [a-z0-9 ]), so downstream oracles may treat it as ground truth.
    * Spark side is the same narrow scan-speed encode as q136. */
  val q162 = Q("q162_bpe_table",
    (s, d) => graft.ops.Bpe.docTokensDf(Catalog.documents(s, d))
      .select(col("doc_id"), col("n_bpe"),
        array_join(col("toks"), "|").as("toks_str")),
    Some(
      s"""WITH ${graft.ops.Bpe.docTokenCtes(normSql)}
         |SELECT doc_id, n_bpe, array_to_string(toks, '|') AS toks_str
         |FROM dt""".stripMargin))

  /** q178 — INTERPOLATED BIGRAM LM PERPLEXITY, the CCNet-style quality
    * filter (train a cheap LM on the corpus, score each document by how
    * surprising its text is to that LM; outliers on either end are
    * boilerplate or garbage). The LM is Jelinek-Mercer interpolated:
    * p(w2|w1) = 0.7·c(w1,w2)/c(w1·) + 0.3·c(w2)/N, with c(w1·) the
    * CONTEXT count (row sum of the bigram table), so every probability
    * is an exact ratio of exact counts. Per-doc score = mean −log2 p
    * over the doc's bigrams, micro-rounded like q66.
    *
    * Scale shape: bigram extraction is array-local (slice/zip inside the
    * row — no window shuffle, no self-join); the three count relations
    * are vocabulary-sized (≪ corpus) groupBys with map-side combine, and
    * at a bounded vocabulary the count joins broadcast. No driver state.
    */
  /** Shared bigram-LM scorer (q178/q188/q193): doc_id, lang, n_bigrams,
    * nll_micro. lang rides through the per-doc groupBy (functionally
    * dependent on doc_id) so downstream per-language consumers never
    * rejoin the corpus. See q178's Scaladoc for the LM and scale shape.
    */
  private[queries] def bigramNll(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // the LM itself — bigram + unigram counts — comes from the STORED
    // count tables ([[graft.ops.LmCounts]], trained once per corpus
    // generation, the production amortization); this scorer's own
    // dataflow is the per-doc bigram extraction + count joins + per-doc
    // aggregate, ONE corpus scan (LmCountsSpec pins the plan). Context
    // counts c(w1·) and the token total N derive from the
    // vocabulary-sized stored relations — c(w1·) = Σ_w2 c(w1,w2)
    // exactly, never a fresh corpus pass.
    val (bc, cuStore) = graft.ops.LmCounts.stored(s, d)
    // plain scan (r19 revert of the r18 spread): the per-doc work here
    // is one split + explode before a corpus-token shuffle that
    // re-partitions by (w1, w2) anyway; the isolated A/B reads plain at
    // or under spread for all three consumers (q178 0.80 vs 0.83,
    // q188 1.08 vs 1.20, q193 1.24 vs 1.28, min-of-5 fresh-JVM runs)
    val docs = Catalog.documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
    val bi = docs.filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
    val cw = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
    val cu = cuStore.withColumnRenamed("w", "w2")
    val n = cu.agg(sum(col("cu")).cast("double").as("n")) // 1 row
    bi.join(bc, Seq("w1", "w2")).join(cw, Seq("w1"))
      .join(cu, Seq("w2")).crossJoin(broadcast(n))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("bigint").as("n_bigrams"),
        round(avg(-log2(
          lit(0.7) * col("cb").cast("double") / col("cw").cast("double")
            + lit(0.3) * col("cu").cast("double") / col("n")))
          * 1e6).cast("bigint").as("nll_micro"))
  }

  /** DuckDB mirror of [[bigramNll]]: CTE chain ending in `score`
    * (doc_id, lang, n_bigrams, nll_micro). */
  private[queries] val nllCtes =
    """docs AS (
      |  SELECT doc_id, lang, regexp_split_to_array(text, '\s+') AS t
      |  FROM documents),
      |toks AS (SELECT doc_id, u.w FROM docs d, unnest(d.t) u(w)),
      |bi AS (
      |  SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, lang, t,
      |               unnest(generate_series(1, len(t) - 1)) AS i
      |        FROM docs WHERE len(t) >= 2)),
      |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
      |cw AS (SELECT w1, sum(cb) AS cw FROM bc GROUP BY 1),
      |cu AS (SELECT w AS w2, count(*) AS cu FROM toks GROUP BY 1),
      |n AS (SELECT CAST(sum(cu) AS DOUBLE) AS n FROM cu),
      |score AS MATERIALIZED (
      |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(round(avg(-log2(
      |        0.7 * CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE)
      |          + 0.3 * CAST(cu AS DOUBLE) / n)) * 1000000) AS BIGINT)
      |      AS nll_micro
      |  FROM bi JOIN bc USING (w1, w2) JOIN cw USING (w1)
      |       JOIN cu USING (w2), n
      |  GROUP BY doc_id, lang)""".stripMargin

  val q178 = Q("q178_bigram_perplexity",
    (s, d) => bigramNll(s, d)
      .select(col("doc_id"), col("n_bigrams"), col("nll_micro")),
    Some(
      s"""WITH $nllCtes
         |SELECT doc_id, n_bigrams, nll_micro FROM score""".stripMargin))

  /** q188 — CCNET PERPLEXITY BUCKETS: split each language's documents
    * into head/middle/tail thirds by LM perplexity (q178's bigram LM) —
    * the CCNet curation step that keeps "head" for training and routes
    * "tail" to filtering. Cutoffs are VALUE thresholds read off a
    * per-language histogram of MILLI-quantized scores (ties inclusive),
    * not per-row ntile: c1 = smallest milli value with cum·3 ≥ total,
    * c2 = smallest with cum·3 ≥ 2·total.
    *
    * Scale shape: the cutoff computation runs on the (lang × milli-grid)
    * HISTOGRAM — map-side-combined counts on a bounded grid, a window
    * over grid-sized data, and a 5-row broadcast back. No per-row ntile
    * (a per-language global sort of the corpus) anywhere; the corpus is
    * touched by one groupBy and one broadcast join.
    */
  val q188 = Q("q188_ccnet_buckets",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = bigramNll(s, d)
        .withColumn("nll_milli", expr("nll_micro div 1000")) // ≥0 — trunc = floor
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hist = scored.groupBy(col("lang"), col("nll_milli"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("lang")).orderBy(col("nll_milli"))
      val wTot = Window.partitionBy(col("lang"))
      val cuts = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("tot", sum(col("c")).over(wTot))
        .groupBy(col("lang"))
        .agg(
          min(when(col("cum") * 3 >= col("tot"), col("nll_milli"))).as("c1"),
          min(when(col("cum") * 3 >= col("tot") * 2, col("nll_milli")))
            .as("c2"))
      scored.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("nll_micro"),
          when(col("nll_milli") <= col("c1"), "head")
            .when(col("nll_milli") <= col("c2"), "middle")
            .otherwise("tail").as("ppl_bucket"))
    },
    Some(
      s"""WITH $nllCtes,
         |sm AS MATERIALIZED (SELECT *, nll_micro // 1000 AS nll_milli
         |      FROM score),
         |hist AS (SELECT lang, nll_milli, count(*) AS c
         |         FROM sm GROUP BY 1, 2),
         |cum AS (SELECT lang, nll_milli,
         |          sum(c) OVER (PARTITION BY lang ORDER BY nll_milli) AS cum,
         |          sum(c) OVER (PARTITION BY lang) AS tot
         |        FROM hist),
         |cuts AS (SELECT lang,
         |           min(CASE WHEN cum * 3 >= tot THEN nll_milli END) AS c1,
         |           min(CASE WHEN cum * 3 >= 2 * tot THEN nll_milli END) AS c2
         |         FROM cum GROUP BY lang)
         |SELECT doc_id, lang, nll_micro,
         |  CASE WHEN nll_milli <= c1 THEN 'head'
         |       WHEN nll_milli <= c2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM sm JOIN cuts USING (lang)""".stripMargin))

  /** q180 — PREFERENCE-PAIR CONSTRUCTION (the DPO/RLHF data-prep op):
    * within each language group, pair the top-quality documents
    * ("chosen") with the bottom-quality ones ("rejected"), rank-aligned
    * (best↔worst, 2nd↔2nd-worst, …), keeping only pairs with a strict
    * quality margin. Quality is q16's composite, QUANTIZED to micro
    * units BEFORE ranking so the rank order is integer-exact in both
    * engines (ranking raw doubles would let a 1-ulp disagreement flip
    * near-ties).
    *
    * Scale shape: two row_number windows partitioned by the group key +
    * one equi join on (group, rank) — per-group top-k, never a cross
    * product; pairs per group are capped at 3. The classic skew caveat
    * (one giant group) is bounded by the window's top-k retention.
    */
  val q180 = {
    val pairK = 3
    val stopHits = langMarkers.head._2
      .map(m => occSql("(' ' || text || ' ')", m)).mkString(" + ")
    val qmSql =
      s"""CAST(round((least(CAST($tokSql AS DOUBLE) / 100.0, 1.0) * 0.3
         |  + CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         |    / nullif(CAST(length(text) AS DOUBLE), 0) * 0.4
         |  + least(CAST($stopHits AS DOUBLE)
         |      / nullif(CAST($tokSql AS DOUBLE), 0) * 5.0, 1.0) * 0.3)
         |  * 1000000) AS BIGINT)""".stripMargin
    Q("q180_preference_pairs",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Catalog.documents(s, d).select(
          col("doc_id"), col("lang"),
          // the CANONICAL composite (TextAnalysis.qualityScore, the one
          // q16/q41 use) — not re-derived inline, so a heuristic tweak
          // can never diverge this query from the canonical score
          round(qualityScore(col("text")) * 1e6).cast("bigint").as("qm"))
        val top = scored.withColumn("pair_rank",
          row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("qm").desc, col("doc_id").asc)))
          .filter(col("pair_rank") <= pairK)
          .select(col("lang"), col("pair_rank").cast("bigint").as("pair_rank"),
            col("doc_id").as("chosen_doc_id"), col("qm").as("cq"))
        val bot = scored.withColumn("pair_rank",
          row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("qm").asc, col("doc_id").desc)))
          .filter(col("pair_rank") <= pairK)
          .select(col("lang"), col("pair_rank").cast("bigint").as("pair_rank"),
            col("doc_id").as("rejected_doc_id"), col("qm").as("rq"))
        top.join(bot, Seq("lang", "pair_rank"))
          .filter(col("cq") > col("rq"))
          .select(col("lang"), col("pair_rank"), col("chosen_doc_id"),
            col("rejected_doc_id"), (col("cq") - col("rq")).as("margin_micro"))
      },
      Some(
        s"""WITH scored AS (SELECT doc_id, lang, $qmSql AS qm FROM documents),
           |top AS (
           |  SELECT lang,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY qm DESC, doc_id ASC) AS BIGINT) AS pair_rank,
           |    doc_id AS chosen_doc_id, qm AS cq
           |  FROM scored QUALIFY pair_rank <= $pairK),
           |bot AS (
           |  SELECT lang,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY qm ASC, doc_id DESC) AS BIGINT) AS pair_rank,
           |    doc_id AS rejected_doc_id, qm AS rq
           |  FROM scored QUALIFY pair_rank <= $pairK)
           |SELECT lang, pair_rank, chosen_doc_id, rejected_doc_id,
           |  cq - rq AS margin_micro
           |FROM top JOIN bot USING (lang, pair_rank)
           |WHERE cq > rq""".stripMargin))
  }

  /** q189 — DSIR IMPORTANCE RESAMPLING (data selection for language
    * models): weight every document by how much its unigram distribution
    * looks like a TARGET domain (here lang='en') versus the RAW corpus,
    * then keep the top fifth by weight. Per-token importance
    * log2(p_target(w)/p_raw(w)) with add-one smoothing over the raw
    * vocabulary; both probabilities are ratios of exact counts, each
    * token's contribution is micro-rounded BEFORE the per-doc sum, so the
    * doc weight is an exact integer sum (no FP accumulation order).
    * The keep cutoff is a value threshold off the global milli-histogram
    * of weights (largest milli value covering ≥20% of docs, ties
    * inclusive) — the same bounded-grid technique as q188, never a
    * global per-row sort.
    *
    * Scale shape: two vocabulary-sized count relations (map-side
    * combine), one corpus-sized token join against them (vocab
    * broadcasts at a bounded vocabulary), a grid-sized histogram window,
    * and a 1-row broadcast threshold. No driver state.
    */
  val q189 = {
    val etaPct = 20 // keep the top fifth
    Q("q189_dsir_importance",
      (s, d) => {
        val toks = Catalog.documentsSpread(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        val cr = toks.groupBy(col("w")).agg(count(lit(1)).as("cr"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ct = Catalog.documents(s, d).filter(col("lang") === "en")
          .select(explode(tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("ct"))
        val totals = cr.agg(
          sum(col("cr")).cast("double").as("nr"),
          count(lit(1)).cast("double").as("v"))
        val nt = ct.agg(sum(col("ct")).cast("double").as("nt"))
        val scored = toks
          .join(cr, Seq("w")).join(ct, Seq("w"), "left")
          .crossJoin(broadcast(totals)).crossJoin(broadcast(nt))
          .select(col("doc_id"),
            round(log2(
              ((coalesce(col("ct"), lit(0L)).cast("double") + 1.0)
                / (col("nt") + col("v")))
                / ((col("cr").cast("double") + 1.0)
                  / (col("nr") + col("v")))) * 1e6)
              .cast("bigint").as("lw"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("bigint").as("n_toks"),
            sum(col("lw")).cast("bigint").as("lw_micro"))
          .withColumn("lw_milli",
            floor(col("lw_micro").cast("double") / 1000.0).cast("bigint"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // descending cumulative histogram via the keyed two-phase form
        // (GridCum, r19): this grid is a per-doc SUM of micro-logs, so
        // its value range grows with document length — the old global
        // ORDER BY DESC window was the one provably-unbounded
        // single-task sort left in the registry
        val cut = graft.ops.GridCum.withCum(
            scored.groupBy(col("lw_milli")).agg(count(lit(1)).as("c")),
            col("lw_milli").desc, "c", "cum")
          .crossJoin(broadcast(
            scored.agg(count(lit(1)).as("tot"))))
          .agg(max(when(col("cum") * 100 >= col("tot") * etaPct,
            col("lw_milli"))).as("cth"))
        scored.crossJoin(broadcast(cut))
          .select(col("doc_id"), col("n_toks"), col("lw_micro"),
            when(col("lw_milli") >= col("cth"), 1L).otherwise(0L)
              .cast("bigint").as("keep"))
      },
      Some(
        s"""WITH toks AS (
           |  SELECT doc_id, u.w
           |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
           |        FROM documents) d, unnest(d.t) u(w)),
           |cr AS (SELECT w, count(*) AS cr FROM toks GROUP BY 1),
           |ct AS (SELECT u.w, count(*) AS ct
           |       FROM (SELECT regexp_split_to_array(text, '\\s+') AS t
           |             FROM documents WHERE lang = 'en') d,
           |            unnest(d.t) u(w)
           |       GROUP BY 1),
           |tr AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr,
           |              CAST(count(*) AS DOUBLE) AS v FROM cr),
           |tt AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt FROM ct),
           |scored AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           |    CAST(sum(CAST(round(log2(
           |      ((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (nt + v))
           |        / ((CAST(cr AS DOUBLE) + 1.0) / (nr + v))) * 1000000)
           |      AS BIGINT)) AS BIGINT) AS lw_micro
           |  FROM toks JOIN cr USING (w) LEFT JOIN ct USING (w), tr, tt
           |  GROUP BY doc_id),
           |sm AS MATERIALIZED (SELECT *,
           |         CAST(floor(CAST(lw_micro AS DOUBLE) / 1000.0) AS BIGINT)
           |           AS lw_milli
           |       FROM scored),
           |hist AS (SELECT lw_milli, count(*) AS c FROM sm GROUP BY 1),
           |cum AS (SELECT lw_milli,
           |          sum(c) OVER (ORDER BY lw_milli DESC) AS cum
           |        FROM hist),
           |tot AS (SELECT count(*) AS tot FROM sm),
           |cut AS (SELECT max(CASE WHEN cum * 100 >= tot * $etaPct
           |                        THEN lw_milli END) AS cth
           |        FROM cum, tot)
           |SELECT doc_id, n_toks, lw_micro,
           |  CAST(CASE WHEN lw_milli >= cth THEN 1 ELSE 0 END AS BIGINT)
           |    AS keep
           |FROM sm, cut""".stripMargin))
  }

  /** q190 — T5 SPAN CORRUPTION (masked span-infilling data prep): break
    * each document's token stream into 3-token blocks, deterministically
    * drop ~20% of blocks (hash60(doc_id:block) % 5 = 0), and emit the
    * (input, target) pair — input has each dropped block replaced by an
    * ordinal `<extra_id_K>` sentinel, target lists each sentinel followed
    * by the tokens it hides. The span choice is salted-hash-deterministic
    * (same rows every run, both engines), never rand().
    *
    * Scale shape: everything is doc-local — block explode, one window
    * partitioned by doc_id for sentinel ordinals, one groupBy doc_id to
    * reassemble (sorted-struct array join, the deterministic string_agg).
    * No cross-doc joins at all; parallelism is per-document.
    */
  val q190 = Q("q190_span_corruption",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val blocks = Catalog.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(t) - 1) div 3)," +
            " b -> array_join(slice(t, b * 3 + 1, 3), ' '))")))
        .withColumnRenamed("pos", "b").withColumnRenamed("col", "btext")
        .withColumn("dropped",
          graft.ops.TextAnalysis.hash60(
            concat(col("doc_id").cast("string"), lit(":"),
              col("b").cast("string"))) % 5 === 0)
      val wS = Window.partitionBy(col("doc_id")).orderBy(col("b"))
      val marked = blocks.withColumn("sidx",
        sum(when(col("dropped"), 1L).otherwise(0L)).over(wS) - 1)
      marked.groupBy(col("doc_id")).agg(
        sum(when(col("dropped"), 1L).otherwise(0L)).cast("bigint")
          .as("n_spans"),
        array_join(expr("transform(sort_array(collect_list(struct(b, " +
          "CASE WHEN dropped THEN concat('<extra_id_', sidx, '>') " +
          "ELSE btext END AS piece))), x -> x.piece)"), " ").as("input_str"),
        coalesce(array_join(expr("transform(sort_array(collect_list(" +
          "CASE WHEN dropped THEN struct(b, concat('<extra_id_', sidx, " +
          "'> ', btext) AS piece) END)), x -> x.piece)"), " "), lit(""))
          .as("target_str"))
    },
    Some(
      s"""WITH docs AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, t[i] AS tok, (i - 1) // 3 AS b, i
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
         |        FROM docs)),
         |blocks AS (
         |  SELECT doc_id, b, string_agg(tok, ' ' ORDER BY i) AS btext,
         |    ${hash60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")} % 5 = 0
         |      AS dropped
         |  FROM pos GROUP BY doc_id, b),
         |marked AS (
         |  SELECT *, sum(CASE WHEN dropped THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY b) - 1 AS sidx
         |  FROM blocks)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_spans,
         |  string_agg(CASE WHEN dropped THEN '<extra_id_' || sidx || '>'
         |                  ELSE btext END, ' ' ORDER BY b) AS input_str,
         |  coalesce(string_agg(CASE WHEN dropped
         |      THEN '<extra_id_' || sidx || '> ' || btext END,
         |    ' ' ORDER BY b), '') AS target_str
         |FROM marked GROUP BY doc_id""".stripMargin))

  /** q191 — IN-ENGINE QUALITY-CLASSIFIER TRAINING (the fastText-style
    * filter model, trained inside the engine): full-batch gradient
    * descent for a logistic-like classifier over 4 handcrafted document
    * features (bias, length score, alpha ratio, capped stopword ratio —
    * q16's components), label = "is the target language". Three exact
    * steps: features are micro-quantized ints, each row's gradient
    * contribution is micro-rounded before the sum (exact integer
    * aggregation — no FP accumulation order), and the link function is
    * the RATIONAL sigmoid 0.5 + z/(2(1+|z|)) — pure arithmetic, so both
    * engines compute bit-identical probabilities (exp() implementations
    * may differ across engines; +,×,/,abs may not).
    *
    * Scale shape: T+1 corpus passes, each a 4-value map-side-combinable
    * aggregate; driver state is the 4 weights (bounded — the KMeans
    * codebook precedent). The oracle replays the identical training as
    * T unrolled CTE stages.
    */
  /** Shared classifier scorer (q191/q205): trains the 3-step model and
    * returns (doc_id, y, p_micro, pred); [[clfCtes]] is the DuckDB
    * replay ending in CTE `p3` (alias `scores`). Hoisted so the AUC
    * evaluation composes the identical training. */
  private[queries] val clfCtes: String = {
    val steps = 3
    val lr = 4.0
    val stopHits = langMarkers.head._2
      .map(m => occSql("(' ' || text || ' ')", m)).mkString(" + ")
    val featSqls = Seq(
      "CAST(1000000 AS BIGINT)",
      s"CAST(round(least(CAST($tokSql AS DOUBLE) / 100.0, 1.0) * 1000000) AS BIGINT)",
      "CAST(round(coalesce(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0), 0) * 1000000) AS BIGINT)",
      s"CAST(round(least(coalesce(CAST($stopHits AS DOUBLE) / nullif(CAST($tokSql AS DOUBLE), 0), 0) * 5.0, 1.0) * 1000000) AS BIGINT)")
    val stepCtes = {
      val sb = new StringBuilder
      sb ++= "p0 AS (SELECT *, CAST(0.0 AS DOUBLE) AS z, CAST(0.5 AS DOUBLE) AS p FROM feats),\n"
      for (t <- 1 to steps) {
        val gdefs = (0 to 3)
          .map(j => s"sum(CAST(round((p - y) * f$j) AS BIGINT)) AS g$j")
          .mkString(", ")
        sb ++= s"g$t AS (SELECT $gdefs FROM p${t - 1}),\n"
        val wdefs = (0 to 3).map { j =>
          val base = if (t == 1) "0" else s"w${t - 1}.w$j"
          s"CAST($base - round($lr * g$j / nn) AS BIGINT) AS w$j"
        }.mkString(", ")
        sb ++= s"w$t AS (SELECT $wdefs FROM g$t, n" +
          (if (t == 1) "" else s", w${t - 1}") + "),\n"
        sb ++= s"z$t AS (SELECT f.*, CAST(f.f0 * w.w0 + f.f1 * w.w1" +
          s" + f.f2 * w.w2 + f.f3 * w.w3 AS DOUBLE) / 1e12 AS z" +
          s" FROM feats f, w$t w),\n"
        sb ++= s"p$t AS (SELECT *, 0.5 + z / (2.0 * (1.0 + abs(z))) AS p" +
          s" FROM z$t)" + (if (t < steps) ",\n" else "")
      }
      sb.toString
    }
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |    ${featSqls.zipWithIndex
             .map { case (e, j) => s"$e AS f$j" }.mkString(",\n    ")}
       |  FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM feats),
       |$stepCtes,
       |scores AS (SELECT doc_id, CAST(y AS BIGINT) AS y,
       |    CAST(round(p * 1000000) AS BIGINT) AS p_micro,
       |    CAST(CASE WHEN z > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |  FROM p$steps)""".stripMargin
  }

  /** The classifier's micro-quantized feature relation (doc_id, y,
    * f0..f3), persisted — read T+1 times by training and once by
    * scoring. */
  /** The classifier's 4 per-row feature columns over `text` — shared
    * by the batch trainer/scorer (q191/q208) and the STREAMING scorer
    * (q213), so the online path can never drift from the trained
    * feature definition. All stateless projections: streaming-safe. */
  private[graft] def clfFeatureCols: Seq[Column] = Seq(
    lit(1000000L).as("f0"),
    round(least(tokenCount(col("text")).cast("double") / 100.0,
      lit(1.0)) * 1e6).cast("bigint").as("f1"),
    round(coalesce(alphaRatio(col("text")), lit(0.0)) * 1e6)
      .cast("bigint").as("f2"),
    round(least(coalesce(stopwordRatio(col("text")), lit(0.0)) * 5.0,
      lit(1.0)) * 1e6).cast("bigint").as("f3"))

  private[queries] def clfFeatures(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val y = when(col("lang") === "en", 1.0).otherwise(0.0)
    Catalog.documents(s, d).select(
      col("doc_id") +: y.as("y") +: clfFeatureCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private def zCol(w: Array[Long]) =
    (col("f0") * w(0) + col("f1") * w(1) + col("f2") * w(2)
      + col("f3") * w(3)).cast("double") / lit(1e12)
  private def pCol(w: Array[Long]) = {
    val zc = zCol(w)
    lit(0.5) + zc / (lit(2.0) * (lit(1.0) + abs(zc)))
  }

  /** Full-batch GD over the persisted feature relation: T map-side
    * aggregate passes, driver state = the 4 micro-quantized weights. */
  private[queries] def clfTrain(
      feats: org.apache.spark.sql.DataFrame): Array[Long] = {
    val steps = 3
    val lr = 4.0
    val nDocs = feats.count()
    // HALF_UP away from zero — the rounding DuckDB's round() and
    // Spark SQL's round() share (Scala math.round differs at -x.5).
    def halfUp(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    var w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to steps) {
      val pc = pCol(w)
      val g = feats.agg(
        sum(round((pc - col("y")) * col("f0")).cast("bigint")),
        sum(round((pc - col("y")) * col("f1")).cast("bigint")),
        sum(round((pc - col("y")) * col("f2")).cast("bigint")),
        sum(round((pc - col("y")) * col("f3")).cast("bigint"))).head()
      w = Array.tabulate(4)(j =>
        w(j) - halfUp(lr * g.getLong(j) / nDocs))
    }
    w
  }

  private[queries] def classifierScores(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val feats = clfFeatures(s, d)
    val w = clfTrain(feats)
    feats.select(col("doc_id"), col("y").cast("bigint").as("y"),
      round(pCol(w) * 1e6).cast("bigint").as("p_micro"),
      when(zCol(w) > 0, 1L).otherwise(0L).cast("bigint").as("pred"))
  }

  val q191 = Q("q191_quality_classifier",
    (s, d) => classifierScores(s, d),
    Some(
      s"""WITH $clfCtes
         |SELECT doc_id, y, p_micro, pred FROM scores""".stripMargin))

  /** q205 — EXACT AUC EVALUATION of the trained classifier (q191's
    * identical training replayed): area under the ROC curve computed
    * EXACTLY from grouped integer score counts with the standard tie
    * correction — AUC·2PN = Σ_s pos_s·(2·cumneg_<s + neg_s) — never a
    * per-row global sort: scores are already micro-quantized, so the
    * whole computation is one grid-sized groupBy, one grid-sized
    * cumulative window, and a 1-row reduce. Integer-ppm output; the
    * scale shape survives any corpus size because the grid (≤10⁶+1
    * distinct scores) bounds the window, not the row count. */
  val q205 = Q("q205_classifier_auc",
    (s, d) => {
      val sc = classifierScores(s, d).select(col("y"), col("p_micro"))
      val g = sc.groupBy(col("p_micro")).agg(
        sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
      val cum = g.withColumn("cneg",
        sum(col("neg")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("p_micro"))) - col("neg"))
      cum.agg(
        sum(col("pos")).cast("bigint").as("n_pos"),
        sum(col("neg")).cast("bigint").as("n_neg"),
        count(lit(1)).cast("bigint").as("n_scores"),
        sum(col("pos") * (lit(2L) * col("cneg") + col("neg")))
          .cast("bigint").as("num2"))
        .select(col("n_pos"), col("n_neg"), col("n_scores"),
          expr("(num2 * 1000000) div greatest(2 * n_pos * n_neg, 1)")
            .cast("bigint")
            .as("auc_ppm"))
    },
    Some(
      s"""WITH $clfCtes,
         |g AS (SELECT p_micro, sum(y) AS pos, count(*) - sum(y) AS neg
         |      FROM scores GROUP BY 1),
         |cum AS (SELECT *,
         |          sum(neg) OVER (ORDER BY p_micro) - neg AS cneg
         |        FROM g),
         |agg AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |          CAST(sum(neg) AS BIGINT) AS n_neg,
         |          CAST(count(*) AS BIGINT) AS n_scores,
         |          CAST(sum(pos * (2 * cneg + neg)) AS BIGINT) AS num2
         |        FROM cum)
         |SELECT n_pos, n_neg, n_scores,
         |  CAST((num2 * 1000000) // greatest(2 * n_pos * n_neg, 1) AS BIGINT)
         |    AS auc_ppm
         |FROM agg""".stripMargin))

  /** q197 — GOPHER QUALITY RULESET: the published rule-based document
    * filter (Rae et al. 2021 §A1.1 "quality filtering", the ruleset
    * every modern curation pipeline starts from), as per-rule integer
    * flags plus the conjunction. Unlike q16's blended score, each rule
    * is an independent 0/1 verdict at the paper's thresholds:
    * word count ∈ [50, 100k]; mean word length ∈ [3, 10]; symbol-to-word
    * ratio (# and …) ≤ 0.1; ≤90% of lines bullet-started; ≤30% of lines
    * ellipsis-ended; ≥80% of words containing an alphabetic char; ≥2 of
    * the 8 designated stop words present.
    *
    * The corpus has no line structure, so the query injects it
    * deterministically (same CASE in the oracle, which defines the
    * contract): every 11th doc gains two bullet lines, every 13th two
    * ellipsis-terminated lines, every 66th becomes a pure bullet list
    * (fails bullet/length/stopword rules).
    *
    * All rule arithmetic is INTEGER (cross-multiplied thresholds — no FP
    * ratios anywhere), line/marker counts are length/replace arithmetic
    * (byte-identical across engines, codegen'd). One scan, zero
    * shuffles: a pure map-side verdict at any scale. */
  val q197 = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val bulletList = (1 to 10).map(i => s"- item $i").mkString("\n")
    Q("q197_gopher_rules",
      (s, d) => {
        val base = Catalog.documents(s, d).select(col("doc_id"), col("text"))
        val t0 = when(col("doc_id") % 11 === 0,
          concat(lit("- bullet alpha\n- bullet beta\n"), col("text")))
          .otherwise(col("text"))
        val t1 = when(col("doc_id") % 13 === 0,
          concat(t0, lit("\nto be continued...\nand more soon...")))
          .otherwise(t0)
        val t = when(col("doc_id") % 66 === 0, lit(bulletList)).otherwise(t1)
        val docs = base.select(col("doc_id"), t.as("text"))
        val txt = col("text")
        val padded = concat(lit(" "),
          regexp_replace(txt, "\\s+", " "), lit(" "))
        def cnt(src: Column, m: String): Column =
          ((length(src) - length(replace(src, lit(m), lit("")))) /
            m.length).cast("bigint")
        val nStop = stops.map(w =>
          when(cnt(padded, s" $w ") > 0, 1L).otherwise(0L)).reduce(_ + _)
        val counted = docs.select(
          col("doc_id"),
          tokenCount(txt).cast("bigint").as("n_words"),
          length(regexp_replace(txt, "\\s+", "")).cast("bigint")
            .as("sum_wlen"),
          size(filter(tokens(txt), w => w.rlike("[A-Za-z]")))
            .cast("bigint").as("n_alpha_words"),
          (cnt(txt, "#") + cnt(txt, "...")).as("n_symbols"),
          (lit(1L) + cnt(txt, "\n")).as("n_lines"),
          cnt(concat(lit("\n"), txt), "\n- ").as("n_bullet_lines"),
          cnt(concat(txt, lit("\n")), "...\n").as("n_ellipsis_lines"),
          nStop.cast("bigint").as("n_stop_hits"))
        def flag(c: Column): Column =
          when(c, 1L).otherwise(0L).cast("bigint")
        counted.select(col("doc_id"), col("n_words"), col("n_lines"),
          col("n_stop_hits"),
          flag(col("n_words") >= 50 && col("n_words") <= 100000)
            .as("r_word_count"),
          flag(col("sum_wlen") >= col("n_words") * 3 &&
            col("sum_wlen") <= col("n_words") * 10).as("r_mean_word_len"),
          flag(col("n_symbols") * 10 <= col("n_words")).as("r_symbol_ratio"),
          flag(col("n_bullet_lines") * 10 <= col("n_lines") * 9)
            .as("r_bullet_lines"),
          flag(col("n_ellipsis_lines") * 10 <= col("n_lines") * 3)
            .as("r_ellipsis_lines"),
          flag(col("n_alpha_words") * 5 >= col("n_words") * 4)
            .as("r_alpha_words"),
          flag(col("n_stop_hits") >= 2).as("r_stop_words"))
          .withColumn("gopher_pass",
            (col("r_word_count") * col("r_mean_word_len") *
              col("r_symbol_ratio") * col("r_bullet_lines") *
              col("r_ellipsis_lines") * col("r_alpha_words") *
              col("r_stop_words")).cast("bigint"))
      },
      Some {
        def cntSql(src: String, m: String, len: Int): String =
          s"CAST((length($src) - length(replace($src, $m, ''))) / $len AS BIGINT)"
        val bulletSql = bulletList.split("\n")
          .map(l => s"'$l'").mkString(" || chr(10) || ")
        val stopSql = stops.map(w =>
          s"CASE WHEN ${cntSql("padded", s"' $w '", w.length + 2)} > 0 THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH injected AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 66 = 0 THEN $bulletSql
           |         ELSE CASE WHEN doc_id % 13 = 0 THEN
           |             (CASE WHEN doc_id % 11 = 0 THEN
           |                '- bullet alpha' || chr(10) || '- bullet beta' || chr(10) || text
           |              ELSE text END)
           |             || chr(10) || 'to be continued...' || chr(10) || 'and more soon...'
           |           ELSE CASE WHEN doc_id % 11 = 0 THEN
           |             '- bullet alpha' || chr(10) || '- bullet beta' || chr(10) || text
           |           ELSE text END END
           |    END AS text
           |  FROM documents),
           |counted AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_words,
           |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS sum_wlen,
           |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
           |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
           |    ${cntSql("text", "'#'", 1)} + ${cntSql("text", "'...'", 3)} AS n_symbols,
           |    1 + ${cntSql("text", "chr(10)", 1)} AS n_lines,
           |    ${cntSql("(chr(10) || text)", "(chr(10) || '- ')", 3)} AS n_bullet_lines,
           |    ${cntSql("(text || chr(10))", "('...' || chr(10))", 4)} AS n_ellipsis_lines,
           |    CAST($stopSql AS BIGINT) AS n_stop_hits
           |  FROM (SELECT doc_id, text,
           |          ' ' || regexp_replace(text, '\\s+', ' ', 'g') || ' ' AS padded
           |        FROM injected)),
           |flags AS (
           |  SELECT doc_id, n_words, n_lines, n_stop_hits,
           |    CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_word_count,
           |    CAST(CASE WHEN sum_wlen >= n_words * 3 AND sum_wlen <= n_words * 10 THEN 1 ELSE 0 END AS BIGINT) AS r_mean_word_len,
           |    CAST(CASE WHEN n_symbols * 10 <= n_words THEN 1 ELSE 0 END AS BIGINT) AS r_symbol_ratio,
           |    CAST(CASE WHEN n_bullet_lines * 10 <= n_lines * 9 THEN 1 ELSE 0 END AS BIGINT) AS r_bullet_lines,
           |    CAST(CASE WHEN n_ellipsis_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END AS BIGINT) AS r_ellipsis_lines,
           |    CAST(CASE WHEN n_alpha_words * 5 >= n_words * 4 THEN 1 ELSE 0 END AS BIGINT) AS r_alpha_words,
           |    CAST(CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop_words
           |  FROM counted)
           |SELECT *,
           |  CAST(r_word_count * r_mean_word_len * r_symbol_ratio
           |    * r_bullet_lines * r_ellipsis_lines * r_alpha_words
           |    * r_stop_words AS BIGINT) AS gopher_pass
           |FROM flags""".stripMargin
      })
  }

  /** q202 — KNESER-NEY BIGRAM PERPLEXITY: the interpolated
    * absolute-discounting LM (the KenLM/CCNet-lineage smoothing q178's
    * Jelinek-Mercer mixture approximates):
    * p(w2|w1) = (max(c(w1,w2) − D, 0) + D·N1+(w1·)·P_cont(w2)) / c(w1·)
    * with D = 0.75 and the CONTINUATION probability
    * P_cont(w2) = N1+(·w2)/N1+(··) — "how many contexts does w2 follow"
    * rather than raw frequency, the distinction that makes KN the
    * default LM smoothing. Per-doc score = mean −log2 p, micro-rounded
    * (q178's idiom; identical fixed-shape FP both engines). Every doc
    * bigram exists in the table (scored on the training corpus), so
    * the discounted term never zeroes the whole probability.
    *
    * Scale shape: q178's exactly — array-local bigram extraction, then
    * FOUR vocabulary-sized count relations (bigram, context-sum +
    * distinct-continuation fused in ONE groupBy, predecessor counts,
    * and a 1-row total), broadcast-joined back; no driver state. */
  val q202 = Q("q202_kneser_ney_perplexity",
    (s, d) => {
      // the bigram count table is the STORED LM ([[graft.ops
      // .LmCounts]], shared with q178's Jelinek-Mercer scorer —
      // identical counts, trained once); everything Kneser-Ney needs
      // (context totals, continuation counts n1+/n1·, the bigram-type
      // total) derives from it by vocabulary-sized groupBys.
      val (bc, _) = graft.ops.LmCounts.stored(s, d)
      val docs = Catalog.documentsSpread(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val bi = docs.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      // context total AND distinct-continuation count in one pass
      val cwn = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cw"),
        count(lit(1)).as("n1f"))
      val n1p = bc.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
      val nbt = bc.agg(count(lit(1)).cast("double").as("nbt")) // 1 row
      bi.join(bc, Seq("w1", "w2")).join(cwn, Seq("w1"))
        .join(n1p, Seq("w2")).crossJoin(broadcast(nbt))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_bigrams"),
          round(avg(-log2(
            (greatest(col("cb").cast("double") - lit(0.75), lit(0.0))
              + lit(0.75) * col("n1f").cast("double")
                * col("n1p").cast("double") / col("nbt"))
              / col("cw").cast("double")))
            * 1e6).cast("bigint").as("nll_kn_micro"))
    },
    Some(
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT doc_id, t,
        |               unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM docs WHERE len(t) >= 2)),
        |bc AS MATERIALIZED (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |cwn AS (SELECT w1, sum(cb) AS cw, count(*) AS n1f FROM bc GROUP BY 1),
        |n1p AS (SELECT w2, count(*) AS n1p FROM bc GROUP BY 1),
        |nbt AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM bc)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(round(avg(-log2(
        |      (greatest(CAST(cb AS DOUBLE) - 0.75, 0.0)
        |        + 0.75 * CAST(n1f AS DOUBLE) * CAST(n1p AS DOUBLE) / nbt)
        |        / CAST(cw AS DOUBLE))) * 1000000) AS BIGINT)
        |    AS nll_kn_micro
        |FROM bi JOIN bc USING (w1, w2) JOIN cwn USING (w1)
        |     JOIN n1p USING (w2), nbt
        |GROUP BY doc_id""".stripMargin))

  /** q208 — BATCHED CLASSIFIER INFERENCE (the "score" member of the
    * embed/score/generate triple, through the same physical seam as
    * q186's embed): train the quality model in-engine (q191's 3
    * full-batch GD passes, driver state = 4 micro-quantized weights),
    * then serve per-document scores through
    * [[graft.ops.ModelInference.score]] — feature extraction stays
    * declarative scan-side, feature vectors are gathered into
    * fixed-size in-partition batches, and the trained model is invoked
    * once per batch (a production reward model / quality classifier
    * swaps the scoreBatch body; weights ride the closure exactly as
    * checkpointed weights ride a GPU worker). The shipped scorer
    * replays the trainer's rational-sigmoid fixed-shape arithmetic in
    * the JVM, so output is BIT-IDENTICAL to q191's declarative scoring
    * — the q12↔q172 "same values, different physical front door"
    * precedent, with the oracle shared verbatim.
    *
    * Scale shape: T+1 bounded aggregate passes for training, then ONE
    * scan through the batch-inference stage — zero shuffles after the
    * feature projection; `pred` derives declaratively from the score
    * (p > ½ ⟺ z > 0 under the strictly monotone rational sigmoid). */
  val q208 = Q("q208_classifier_inference",
    (s, d) => {
      import graft.ops.ModelInference
      val feats = clfFeatures(s, d)
      val w = clfTrain(feats)
      val batch = s.conf.get(ModelInference.batchSizeKey,
        ModelInference.defaultBatchSize.toString).toInt
      // pred (the z > 0 decision) stays declarative and rides THROUGH
      // the seam: deriving it from the rounded score would misclassify
      // 0 < z < 1e-6 (p rounds down to exactly 500000)
      ModelInference.score(
          feats.select(col("doc_id"), col("y"),
            when(zCol(w) > 0, 1L).otherwise(0L).cast("bigint").as("pred"),
            array(col("f0"), col("f1"), col("f2"), col("f3")).as("f")),
          "f", new ModelInference.RationalLogisticScorer(w), batch)
        .select(col("doc_id"), col("y").cast("bigint").as("y"),
          col("score_micro").as("p_micro"), col("pred"))
    },
    Some(
      s"""WITH $clfCtes
         |SELECT doc_id, y, p_micro, pred FROM scores""".stripMargin))

  /** q212 — CROSS-ENCODER RERANK (the PAIR face of the inference
    * seam): the standard two-stage retrieval/curation stack — a cheap
    * first-stage retriever narrows the corpus, an expensive pairwise
    * model re-scores only the survivors. Stage 1 is q109's BM25
    * (shared [[bm25Ranked]], top 50); stage 2 routes each (query, doc)
    * pair through [[graft.ops.ModelInference.scorePairs]] — fixed-size
    * in-partition batches, ONE model call per batch — with the
    * deterministic [[graft.ops.ModelInference.TermProximityScorer]]
    * standing in for the cross-encoder (first-position + term-PAIR
    * proximity interactions: a genuinely joint query×document score no
    * per-side embedding factorizes; the oracle replays it in closed
    * form from regexp_split_to_array + list_position). Output: top 10
    * by cross-encoder score, BM25 score carried for comparison.
    *
    * Scale shape (100 TB): the rerank cost is bounded by candK × the
    * model call, never corpus-sized — candidates broadcast into one
    * corpus scan (broadcast hash join on doc_id fetches the 50 texts;
    * at scale this is the point-lookup fetch stage every reranker
    * runs), and the seam stage itself is scan-local, zero shuffles
    * after the fetch. A production reranker swaps `scorePairBatch`
    * and resizes `spark.graft.inference.batchSize`; the dataflow is
    * unchanged. */
  val q212 = {
    val candK = 50
    val topK = 10
    val queryText = bm25Terms.mkString(" ")
    Q("q212_cross_encoder_rerank",
      (s, d) => {
        import graft.ops.ModelInference
        val batch = s.conf.get(ModelInference.batchSizeKey,
          ModelInference.defaultBatchSize.toString).toInt
        val cand = bm25Ranked(s, d)
          .orderBy(col("score_micro").desc, col("doc_id").asc).limit(candK)
          .withColumnRenamed("score_micro", "bm25_micro")
        val pairs = Catalog.documents(s, d)
          .select(col("doc_id"), col("text"))
          .join(broadcast(cand), "doc_id")
          .select(col("doc_id"), col("bm25_micro"),
            lit(queryText).as("query"), col("text"))
        ModelInference.scorePairs(pairs, "query", "text",
            new ModelInference.TermProximityScorer, batch)
          .orderBy(col("ce_micro").desc, col("doc_id").asc)
          .limit(topK)
      },
      Some {
        val terms = bm25Terms
        val k = terms.length
        val posCols = terms.indices.map(i =>
          s"COALESCE(list_position(d.toks, '${terms(i)}'), 0) AS p$i")
        // fixed accumulation order: singles k asc, then pairs (a,b)
        // lexicographic — mirrors TermProximityScorer's loop exactly
        val singles = terms.indices.map(i =>
          s"(CASE WHEN p$i > 0 THEN ${k - i}.0 / (1.0 + p$i) " +
            "ELSE 0.0 END)")
        val pairsSql = (for {
          a <- 0 until k; b <- (a + 1) until k
        } yield
          s"(CASE WHEN p$a > 0 AND p$b > 0 THEN ${2 * k - a - b}.0" +
            s" / (1.0 + abs(p$a - p$b)) ELSE 0.0 END)")
        s"""WITH cand AS (${bm25OracleSql(candK)}),
           |d AS (SELECT doc_id, regexp_split_to_array(text, '\\s+')
           |        AS toks FROM documents),
           |p AS (SELECT c.doc_id, c.score_micro AS bm25_micro,
           |        ${posCols.mkString(",\n        ")}
           |      FROM cand c JOIN d USING (doc_id)),
           |s AS (SELECT doc_id, bm25_micro,
           |        ${(singles ++ pairsSql).mkString("\n      + ")}
           |          AS sc
           |      FROM p)
           |SELECT doc_id, bm25_micro,
           |  CAST(round(sc * 1e6) AS BIGINT) AS ce_micro
           |FROM s ORDER BY ce_micro DESC, doc_id LIMIT $topK"""
          .stripMargin
      })
  }

  val all: Seq[Q] =
    Seq(q14, q15, q16, q17, q62, q66, q75, q103, q109, q118, q136, q137,
      q155, q162, q178, q180, q188, q189, q190, q191, q197, q202, q205,
      q208, q212)
}
