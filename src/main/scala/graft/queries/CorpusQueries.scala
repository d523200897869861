package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._
import graft.plans.TopKPerGroup
import graft.tables.Catalog

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond dedup/similarity: sequence packing, repetition-based
  * quality filters (the Gopher-rule analogs), TF-IDF term weighting,
  * stopword removal, and deterministic shard assignment for training
  * writers. All shapes are keyed shuffles — nothing corpus², nothing
  * driver-side.
  */
object CorpusQueries {

  private val tokSqlArr = """regexp_split_to_array(text, '\s+')"""

  /** q79 — SEQUENCE PACKING: lay documents head-to-tail into fixed
    * 512-token training sequences, packed per source shard (the unit a
    * real pipeline packs within, so the window is keyed and parallel —
    * a single global ORDER BY would serialize on one task at 100 TB).
    * Each doc gets the sequence id and offset where its first token
    * lands; `div`/`%` keep the arithmetic in exact integer space (a
    * double floor() would corrupt offsets past 2^53 cumulative tokens).
    */
  val q79 = Q("q79_sequence_packing",
    (s, d) => graft.ops.Packing.pack(
      Catalog.documents(s, d)
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).cast("bigint").as("n_tokens")),
      "source", "doc_id", "n_tokens", 512),
    Some(
      s"""SELECT doc_id, source, n_tokens,
         |  CAST(start_off // 512 AS BIGINT) AS seq_id,
         |  CAST(start_off % 512 AS BIGINT) AS seq_off
         |FROM (
         |  SELECT doc_id, source,
         |    CAST(len($tokSqlArr) AS BIGINT) AS n_tokens,
         |    COALESCE(SUM(CAST(len($tokSqlArr) AS BIGINT))
         |      OVER (PARTITION BY source ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0) AS start_off
         |  FROM documents)""".stripMargin))

  /** q80 — REPETITION QUALITY FILTER (Gopher-style): per-doc top-unigram
    * fraction and duplicate-bigram fraction, plus the resulting
    * keep/drop label. Bigrams are built array-side (zip_with against the
    * tail slice — narrow, no shuffle) so the only shuffles are the two
    * keyed per-doc aggregations. Fractions divide doubles cast from
    * exact bigint counts (IEEE-identical across engines).
    */
  private[queries] val uniT = 0.12 // top-unigram frac above → repetitive
  private[queries] val biT = 0.20  // dup-bigram frac above → repetitive

  /** Appends (n_tokens, top_unigram_frac, dup_bigram_frac, rep_label)
    * from ONE [[graft.functions.TokenRepStats]] pass over `text` —
    * shared by q80 and the q93 pipeline so the label derivation cannot
    * drift, and so q93 computes labels AND fingerprints in a single
    * corpus scan (r18; the previous form shuffled the exploded token
    * relation four times and re-scanned documents for the join).
    * Zero-token docs drop out (the exploded form's aggregation dropped
    * them too); a doc with no bigram reports 0.0 dup fraction (the old
    * left-join NULL → coalesce path). */
  private def withRepStats(docs: DataFrame): DataFrame = docs
    .withColumn("st", graft.functions.TokenRepStats(tokens(col("text"))))
    .filter(col("st.n_tok") > 0)
    .withColumn("n_tokens", col("st.n_tok"))
    .withColumn("top_unigram_frac",
      col("st.max_uni").cast("double") / col("st.n_tok").cast("double"))
    .withColumn("dup_bigram_frac",
      when(col("st.n_bi") > 0,
          (col("st.n_bi") - col("st.n_bi_d")).cast("double")
            / col("st.n_bi").cast("double"))
        .otherwise(lit(0.0)))
    .withColumn("rep_label",
      when(col("top_unigram_frac") > uniT, "repetitive")
        .when(col("dup_bigram_frac") > biT, "repetitive")
        .otherwise("ok"))
    .drop("st")

  val q80 = {
    Q("q80_repetition_filter",
      (s, d) => withRepStats(Catalog.documentsSpread(s, d)
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("n_tokens"), col("top_unigram_frac"),
          col("dup_bigram_frac"), col("rep_label")),
      Some(
        s"""WITH d AS (SELECT doc_id, $tokSqlArr AS a FROM documents),
           |uni AS (
           |  SELECT doc_id, u.t, count(*) AS c
           |  FROM d, unnest(d.a) AS u(t) GROUP BY 1, 2),
           |uagg AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
           |    CAST(max(c) AS BIGINT) AS max_uni
           |  FROM uni GROUP BY 1),
           |bg AS (
           |  SELECT doc_id, u.b, count(*) AS c
           |  FROM d, unnest(list_transform(generate_series(1, len(a) - 1),
           |    i -> a[i] || ' ' || a[i + 1])) AS u(b)
           |  GROUP BY 1, 2),
           |bagg AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi,
           |    CAST(count(*) AS BIGINT) AS n_bi_d
           |  FROM bg GROUP BY 1),
           |j AS (
           |  SELECT doc_id, n_tok AS n_tokens,
           |    CAST(max_uni AS DOUBLE) / CAST(n_tok AS DOUBLE)
           |      AS top_unigram_frac,
           |    COALESCE(CAST(n_bi - n_bi_d AS DOUBLE)
           |      / CAST(n_bi AS DOUBLE), 0.0) AS dup_bigram_frac
           |  FROM uagg LEFT JOIN bagg USING (doc_id))
           |SELECT *,
           |  CASE WHEN top_unigram_frac > $uniT THEN 'repetitive'
           |       WHEN dup_bigram_frac > $biT THEN 'repetitive'
           |       ELSE 'ok' END AS rep_label
           |FROM j""".stripMargin))
  }

  /** q81 — TF-IDF TOP TERMS per document, through the custom bounded
    * top-k operator (plans/TopKPerGroup — second consumer after q70, so
    * the per-doc trim never materializes the full scored relation into
    * a sort). Scores quantize to micro units (round(tf·ln(N/df)·10⁶))
    * because ln is the one non-correctly-rounded libm call; ties (e.g.
    * the score-0 everywhere-terms) break on term asc — (score, term) is
    * a total order because terms are unique per doc.
    */
  val q81 = Q("q81_tfidf_top_terms",
    (s, d) => {
      val docs = Catalog.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val scored = tf.join(dfreq, "t").crossJoin(broadcast(n))
        .select(col("doc_id"), col("t").as("term"),
          round(col("tf").cast("double")
            * log(col("n_docs") / col("df").cast("double")) * 1e6)
            .cast("bigint").as("score_micro"))
      TopKPerGroup(scored, 3, Seq(col("doc_id")),
        Seq(col("score_micro").desc, col("term").asc))
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id, u.t
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS a
        |        FROM documents) d, unnest(d.a) AS u(t)),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, t AS term,
        |    CAST(round(CAST(tf AS DOUBLE)
        |      * ln(n_docs / CAST(df AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS score_micro
        |  FROM tf JOIN df USING (t), n),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id
        |        ORDER BY score_micro DESC, term) AS rn
        |      FROM scored)
        |SELECT doc_id, term, score_micro FROM r WHERE rn <= 3""".stripMargin))

  /** Stopword list shared by the Spark side and the generated oracle —
    * one declaration, so the two cannot drift. */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on")

  /** q82 — STOPWORD REMOVAL: array-side filter against a small inline
    * set (narrow, codegen'd, no shuffle at all — the whole op is a
    * projection). Emits the cleaned text plus kept/total counts.
    */
  val q82 = {
    val stopSqlList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    Q("q82_stopword_removal",
      (s, d) => Catalog.documents(s, d)
        .select(col("doc_id"),
          tokenCount(col("text")).cast("bigint").as("n_tokens"),
          filter(tokens(col("text")),
            t => !t.isInCollection(stopwords)).as("kept"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("kept")).cast("bigint").as("n_kept"),
          concat_ws(" ", col("kept")).as("clean_text")),
      Some(
        s"""WITH d AS (SELECT doc_id, $tokSqlArr AS a FROM documents),
           |f AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens,
           |        list_filter(a,
           |          t -> NOT list_contains($stopSqlList, t)) AS kept
           |      FROM d)
           |SELECT doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
           |  array_to_string(kept, ' ') AS clean_text
           |FROM f""".stripMargin))
  }

  /** q83 — DETERMINISTIC SHARD ASSIGNMENT for training writers: shard =
    * content-hash mod 16 (so reruns and retries land identically — no
    * rand()), position within shard by (hash, doc_id). The window is
    * keyed by shard, so at scale each of the 16..4096 shards sorts
    * independently; content-hashing also decorrelates shard from source
    * order, giving writers balanced output files.
    */
  val q83 = Q("q83_shard_assign",
    (s, d) => {
      val hashed = Catalog.documents(s, d)
        .select(col("doc_id"), hash60(normalizeText(col("text"))).as("h"))
        .withColumn("shard", pmod(col("h"), lit(16L)))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      hashed.select(col("doc_id"), col("shard"),
        row_number().over(w).cast("bigint").as("pos_in_shard"))
    },
    Some {
      val h = TextQueries.hash60Sql(TextQueries.normSql)
      s"""WITH d AS (SELECT doc_id, $h AS h FROM documents)
         |SELECT doc_id, h % 16 AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 16
         |    ORDER BY h, doc_id) AS BIGINT) AS pos_in_shard
         |FROM d""".stripMargin
    })

  /** q86 — window-function breadth beyond q32 (lead, dense_rank,
    * percent_rank, cume_dist, nth_value, last_value over an explicit
    * whole-partition frame). Money as exact cents; the rank-family
    * doubles are rationals of exact counts — identical across engines.
    * Total order inside each partition via (ts, event_id); frames are
    * written out explicitly so both engines agree on nth/last semantics.
    */
  val q86 = {
    Q("q86_window_breadth",
      (s, d) => {
        val e = Catalog.events(s, d).select(col("event_id"),
          col("event_type"), col("ts"),
          round(col("value") * 100).cast("bigint").as("cents"))
        val wTime = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val wVal = Window.partitionBy(col("event_type"))
          .orderBy(col("cents").desc, col("event_id"))
        e.select(col("event_id"), col("event_type"), col("cents"),
          lead(col("cents"), 1).over(wTime).as("next_cents"),
          dense_rank().over(wVal).cast("bigint").as("dr"),
          percent_rank().over(wVal).as("pr"),
          cume_dist().over(wVal).as("cd"),
          nth_value(col("event_id"), 3).over(
            wTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("third_id"),
          last(col("event_id")).over(
            wTime.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("last_id"))
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, event_type, ts,
          |    CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM events)
          |SELECT event_id, event_type, cents,
          |  lead(cents, 1) OVER wt AS next_cents,
          |  CAST(dense_rank() OVER wv AS BIGINT) AS dr,
          |  percent_rank() OVER wv AS pr,
          |  cume_dist() OVER wv AS cd,
          |  nth_value(event_id, 3) OVER (
          |    PARTITION BY event_type ORDER BY ts, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_id,
          |  last_value(event_id) OVER (
          |    PARTITION BY event_type ORDER BY ts, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS last_id
          |FROM e
          |WINDOW wt AS (PARTITION BY event_type ORDER BY ts, event_id),
          |       wv AS (PARTITION BY event_type
          |              ORDER BY cents DESC, event_id)""".stripMargin))
  }

  /** q87 — GLOBAL CURRICULUM RANK without a global sort
    * ([[graft.ops.GlobalRank]]): every document numbered under the
    * total order (longest first, doc_id tiebreak) through the
    * range-partition + per-partition-window + offset-correction shape —
    * the naive `row_number() OVER (ORDER BY …)` would pull the whole
    * corpus through one task. The oracle IS that naive global window
    * (DuckDB is single-node anyway), so hash-green proves the two-phase
    * form computes identical ranks. */
  val q87 = Q("q87_global_rank",
    (s, d) => graft.ops.GlobalRank.withRank(
      Catalog.documents(s, d).select(col("doc_id"), col("n_chars")),
      Seq(col("n_chars").desc, col("doc_id").asc))
      .select(col("doc_id"), col("n_chars"),
        col("rank").cast("bigint").as("rank")),
    Some(
      """SELECT doc_id, n_chars,
        |  CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |    AS BIGINT) AS rank
        |FROM documents""".stripMargin))

  /** q88 — PACKED-SEQUENCE MATERIALIZATION: the step after q79's offset
    * assignment — actually build each fixed 512-token training sequence,
    * with documents WRAPPING across sequence boundaries (a doc spanning
    * sequences s0..s1 contributes the token slice that lands in each).
    * Per (source, seq): contributing doc count, token count (exactly 512
    * except each source's tail sequence), and the md5 fingerprint of the
    * packed text (portable across engines; the gate never ships
    * megabyte text cells). Shapes: the span explode is narrow (≤2 rows
    * per doc in the common case); the only shuffle is the keyed
    * (source, seq) aggregation with an in-group sort of ~a few docs. */
  val q88 = Q("q88_sequence_materialize",
    (s, d) => {
      val packed = graft.ops.Packing.pack(
        Catalog.documents(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")).cast("bigint")),
        "source", "doc_id", "n", 512)
        .withColumn("start", col("seq_id") * 512 + col("seq_off"))
      val spans = packed.select(col("source"), col("doc_id"), col("toks"),
          col("n"), col("start"),
          explode(expr("sequence(start div 512, (start + n - 1) div 512)"))
            .as("seq"))
        .withColumn("lo", greatest(col("seq") * 512 - col("start"), lit(0L)))
        .withColumn("hi", least(col("n"), (col("seq") + 1) * 512 - col("start")))
        .select(col("source"), col("seq"), col("doc_id"),
          array_join(slice(col("toks"), (col("lo") + 1).cast("int"),
            (col("hi") - col("lo")).cast("int")), " ").as("chunk"),
          (col("hi") - col("lo")).as("k"))
      spans.groupBy(col("source"), col("seq").as("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("k")).as("n_tokens"),
          md5(array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("chunk")))),
            s => s("chunk")), " ")).as("fp"))
    },
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, source, $tokSqlArr AS toks,
         |    CAST(len($tokSqlArr) AS BIGINT) AS n
         |  FROM documents),
         |p AS (
         |  SELECT *, COALESCE(CAST(SUM(n) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND 1 PRECEDING) AS BIGINT), 0) AS start
         |  FROM d),
         |spans AS (
         |  SELECT source, doc_id, toks, n, start, u.seq
         |  FROM p, unnest(generate_series(start // 512,
         |    (start + n - 1) // 512)) u(seq)),
         |chunks AS (
         |  SELECT source, seq, doc_id,
         |    array_to_string(toks[greatest(seq * 512 - start, 0) + 1 :
         |      least(n, (seq + 1) * 512 - start)], ' ') AS chunk,
         |    least(n, (seq + 1) * 512 - start)
         |      - greatest(seq * 512 - start, 0) AS k
         |  FROM spans)
         |SELECT source, seq AS seq_id, count(*) AS n_docs,
         |  CAST(sum(k) AS BIGINT) AS n_tokens,
         |  md5(string_agg(chunk, ' ' ORDER BY doc_id)) AS fp
         |FROM chunks GROUP BY 1, 2""".stripMargin))

  /** q91 — the CUSTOM AGGREGATE FUNCTION
    * ([[graft.functions.BoundedTopKAgg]], TypedImperativeAggregate): per
    * source, the 5 smallest document fingerprint hashes as one csv cell,
    * computed in bounded k-element heaps with map-side partial merge.
    * The oracle ranks with a window and string_aggs the survivors —
    * hash-green proves heap semantics (dups kept, value order, merge
    * associativity) equal the declarative form. */
  val q91 = Q("q91_bounded_topk_agg",
    (s, d) => Catalog.documents(s, d)
      .select(col("source"), hash60(normalizeText(col("text"))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.BoundedTopKAgg.smallestCsv(col("h"), 5)
          .as("smallest5")),
    Some {
      val h = TextQueries.hash60Sql(TextQueries.normSql)
      s"""WITH d AS (SELECT source, $h AS h FROM documents),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM d),
         |n AS (SELECT source, count(*) AS n_docs FROM d GROUP BY 1)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  (SELECT string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)
         |   FROM r WHERE r.source = n.source AND rn <= 5) AS smallest5
         |FROM n""".stripMargin
    })

  /** q93 — END-TO-END CORPUS PIPELINE v2 (q41's successor over the
    * round-5 ops): repetition filter (q80 labels) → exact dedup
    * (min-doc_id per content fingerprint) → per-source sequence packing
    * → shard accounting. Every stage is a keyed shuffle or a narrow
    * projection; the composition adds nothing super-linear. */
  val q93 = Q("q93_pack_pipeline",
    (s, d) => {
      // labels AND fingerprints in ONE corpus scan (withRepStats, r18)
      // — the previous form ran q80's whole dataflow, re-scanned
      // documents for the fingerprints, and joined the two
      val keep = withRepStats(Catalog.documentsSpread(s, d)
          .select(col("doc_id"), col("source"), col("text")))
        .filter(col("rep_label") === "ok")
        .select(col("doc_id"), col("source"),
          fingerprintMd5(col("text")).as("fp"), col("n_tokens"))
      // min-doc_id-per-fp via an UNORDERED fp window (whole-partition
      // frame) instead of groupBy + semi-join: the aggregate form
      // re-materialized the scan (stats + normalize + md5) for each
      // side — same single fp-keyed shuffle, ONE corpus scan
      val surv = keep
        .withColumn("min_id",
          min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("min_id")).drop("min_id")
      graft.ops.Packing.pack(surv, "source", "doc_id", "n_tokens", 512)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (max(col("seq_id")) + 1).as("n_seqs"),
          sum(col("n_tokens")).as("n_tokens"))
    },
    Some {
      val norm = TextQueries.normSql
      s"""WITH d AS (SELECT doc_id, source, $tokSqlArr AS a, text
         |           FROM documents),
         |uni AS (SELECT doc_id, u.t, count(*) AS c
         |        FROM d, unnest(d.a) AS u(t) GROUP BY 1, 2),
         |uagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |           CAST(max(c) AS BIGINT) AS max_uni
         |         FROM uni GROUP BY 1),
         |bg AS (SELECT doc_id, u.b, count(*) AS c
         |       FROM d, unnest(list_transform(generate_series(1, len(a) - 1),
         |         i -> a[i] || ' ' || a[i + 1])) AS u(b)
         |       GROUP BY 1, 2),
         |bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi,
         |           CAST(count(*) AS BIGINT) AS n_bi_d
         |         FROM bg GROUP BY 1),
         |lab AS (SELECT doc_id FROM uagg LEFT JOIN bagg USING (doc_id)
         |        WHERE NOT (CAST(max_uni AS DOUBLE) / CAST(n_tok AS DOUBLE)
         |                     > $uniT
         |          OR COALESCE(CAST(n_bi - n_bi_d AS DOUBLE)
         |               / CAST(n_bi AS DOUBLE), 0.0) > $biT)),
         |keep AS (SELECT d.doc_id, d.source, uagg.n_tok AS n_tokens,
         |           md5($norm) AS fp
         |         FROM d JOIN uagg USING (doc_id) JOIN lab USING (doc_id)),
         |canon AS (SELECT fp, min(doc_id) AS doc_id FROM keep GROUP BY 1),
         |surv AS (SELECT k.* FROM keep k
         |         JOIN canon c ON k.fp = c.fp AND k.doc_id = c.doc_id),
         |p AS (SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
         |        PARTITION BY source ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |        AS BIGINT), 0) AS start
         |      FROM surv)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(start // 512) + 1 AS BIGINT) AS n_seqs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM p GROUP BY 1""".stripMargin
    })

  /** q99 — DATA PROFILING audit ([[graft.ops.Profile]]): per-column
    * null/distinct/min/max over documents in ONE scan (a per-column
    * loop would scan the corpus once per column). The oracle is the
    * per-column UNION ALL expansion. */
  val q99 = Q("q99_profile",
    (s, d) => graft.ops.Profile.profile(
      Catalog.documents(s, d),
      Seq("doc_id", "lang", "source", "n_chars")),
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS column_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s
           |FROM documents""".stripMargin
      Seq("doc_id", "lang", "source", "n_chars").map(one)
        .mkString("\nUNION ALL\n")
    })

  /** q100 — SKEW-SALTED join + two-phase aggregation at the hard gate
    * (SkewSpec proves the mechanics; this proves RESULTS): events join
    * a per-user dim through [[graft.ops.Skew.saltedJoin]] (key spread
    * over 8 salts) and the per-type revenue rolls up through
    * [[graft.ops.Skew.saltedSumCount]]. Salting must be invisible to
    * results — the oracle is the plain join + plain GROUP BY. */
  val q100 = Q("q100_salted_join",
    (s, d) => {
      val e = Catalog.events(s, d).select(col("user_id"),
        col("event_type"), round(col("value") * 100).cast("bigint").as("cents"))
      val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("user_events"))
        .select(col("user_id").as("u"), col("user_events"))
      val joined = graft.ops.Skew.saltedJoin(e, dim, "user_id", "u", 8)
        .select(col("event_type"),
          (col("cents") * col("user_events")).as("weighted"))
      graft.ops.Skew.saltedSumCount(joined, "event_type", "weighted", 8)
    },
    Some(
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |dim AS (SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
        |        FROM e GROUP BY 1)
        |SELECT event_type,
        |  CAST(sum(cents * user_events) AS BIGINT) AS sum_weighted,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM e JOIN dim USING (user_id)
        |GROUP BY 1""".stripMargin))

  /** q140 — BPE-BUDGETED SEQUENCE PACKING: q79's head-to-tail layout
    * re-cut over REAL subword counts ([[graft.ops.Bpe]], the pinned
    * merge table) instead of whitespace words — context windows are
    * budgeted in model-tokenizer tokens, so this is the packing a
    * training writer actually runs. Same keyed-window scale shape as
    * q79 (per-shard pack, exact div/%); the token counting itself is a
    * narrow map-side rewrite, so the only shuffle is still the one
    * keyed window. */
  val q140 = {
    Q("q140_bpe_packing",
      (s, d) => graft.ops.Packing.pack(
        Catalog.documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.ops.Bpe.tokenCount(col("text")).cast("bigint")
              .as("n_bpe")),
        "source", "doc_id", "n_bpe", 512),
      Some(
        s"""WITH ${graft.ops.Bpe.dtFixtureCte}
           |SELECT doc_id, source, n_bpe,
           |  CAST(start_off // 512 AS BIGINT) AS seq_id,
           |  CAST(start_off % 512 AS BIGINT) AS seq_off
           |FROM (
           |  SELECT doc_id, source, n_bpe,
           |    COALESCE(SUM(n_bpe)
           |      OVER (PARTITION BY source ORDER BY doc_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS start_off
           |  FROM (SELECT d.doc_id, d.source, dt.n_bpe
           |        FROM documents d JOIN dt ON d.doc_id = dt.doc_id))""".stripMargin))
  }

  /** q142 — TOKEN-WINDOW CHUNKING: packing's complement — docs LONGER
    * than the context budget split into overlapping 16-token windows
    * (stride 12, overlap 4), the standard RAG/pretraining chunker.
    * Chunk width is tokenizer-relative: under the pinned 1k-rule
    * phrase-merging table a document is ~6–60 tokens, so 16 tokens is
    * the multi-chunk regime 64 was under the earlier word-level table.
    * Entirely array-side per doc: tokenize once ([[graft.ops.Bpe]]),
    * derive the chunk count arithmetically, explode chunk indices,
    * slice the token array — a narrow map-side explode bounded by
    * ⌈n/stride⌉ rows per doc, no shuffle at all (the ONLY wide op in
    * the plan is none — chunk identity is (doc_id, chunk_id)). Each
    * chunk carries its token offset, its true length, and a 60-bit
    * fingerprint of the joined tokens — the key chunk-level dedup and
    * retrieval indexes both build on. */
  val q142 = {
    val chunk = 16
    val overlap = 4
    val stride = chunk - overlap
    Q("q142_token_chunking",
      (s, d) => graft.ops.Bpe.storedTokens(s, d)
        .select(col("doc_id"), col("toks"))
        .withColumn("n", size(col("toks")).cast("bigint"))
        .filter(col("n") > 0)
        .withColumn("c",
          expr(s"(greatest(n - $overlap, 1L) + ${stride - 1}) div $stride"))
        .withColumn("chunk_id",
          explode(sequence(lit(0L), col("c") - 1)))
        .withColumn("start_tok", col("chunk_id") * stride)
        .withColumn("chunk_toks",
          slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunk)))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"),
          size(col("chunk_toks")).cast("bigint").as("n_chunk_tokens"),
          hash60(array_join(col("chunk_toks"), " ")).as("chunk_fp")),
      Some {
        s"""WITH ${graft.ops.Bpe.dtFixtureCte},
           |sized AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
           |          FROM dt WHERE len(toks) > 0),
           |chunks AS (SELECT doc_id, toks, n,
           |             (greatest(n - $overlap, 1) + ${stride - 1}) // $stride
           |               AS c
           |           FROM sized)
           |SELECT doc_id, u.i AS chunk_id, u.i * $stride AS start_tok,
           |  CAST(len(list_slice(toks, u.i * $stride + 1,
           |    least(u.i * $stride + $chunk, n))) AS BIGINT)
           |    AS n_chunk_tokens,
           |  CAST(('0x' || substr(md5(array_to_string(
           |    list_slice(toks, u.i * $stride + 1,
           |      least(u.i * $stride + $chunk, n)), ' ')), 1, 15)) AS BIGINT)
           |    AS chunk_fp
           |FROM chunks, unnest(generate_series(0, c - 1)) u(i)""".stripMargin
      })
  }

  /** q143 — CHUNK-LEVEL CROSS-DOC DEDUP: q142's fingerprints rolled up
    * to the near-verbatim-span report — which 16-token windows recur
    * across DIFFERENT documents, how often, and who owns the canonical
    * copy (min doc_id). The q63 paragraph-dedup shape at tokenizer
    * granularity: one groupBy on the 60-bit fp (map-side combinable —
    * duplicated chunks collapse per partition before the exchange),
    * never a chunk×chunk join. Only full-width chunks participate
    * (tail fragments of different lengths would never match anyway and
    * their exclusion makes the report size-stable). */
  val q143 = {
    val chunk = 16
    Q("q143_chunk_dedup",
      (s, d) => q142.run(s, d)
        .filter(col("n_chunk_tokens") === chunk)
        .groupBy(col("chunk_fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("canonical_doc"))
        .filter(col("n_docs") > 1),
      q142.oracle.map(sql =>
        s"""WITH chunks AS ($sql)
           |SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |       count(*) AS n_occurrences,
           |       min(doc_id) AS canonical_doc
           |FROM chunks WHERE n_chunk_tokens = $chunk
           |GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin))
  }

  /** q157 — THE TRAINING-DATA PIPELINE, END TO END: the four stages a
    * pretraining writer actually chains — quality gate → exact dedup →
    * mixture sample → sequence pack — composed as ONE dataflow over
    * the operators this engine already verifies separately
    * (q155's compressibility signal, q18's fingerprint-canonical
    * dedup, q141's quota-hash mixture, q140's keyed-window packing).
    * The point of the query is the COMPOSITION: every stage is a
    * narrow transform or a keyed/bounded shuffle, so the fused plan is
    * scan → project → one dedup exchange → filter → one pack window —
    * no stage forces a second corpus pass, which is what makes the
    * chain run at 100 TB. Hash-green proves four stages of exact
    * arithmetic survive composition bit-for-bit. */
  val q157 = {
    val budget = 512
    Q("q157_training_data_pipeline",
      (s, d) => {
        val norm = normalizeText(col("text"))
        val base = Catalog.documents(s, d)
          .select(col("doc_id"), col("source"),
            length(norm).cast("bigint").as("n_chars"),
            hash60(norm).as("fp"))
          .join(graft.ops.Bpe.storedTokens(s, d)
            .select(col("doc_id"), col("n_bpe")), "doc_id")
        // 1. quality: enough tokens, compresses like corpus text
        val quality = base
          .filter(col("n_bpe") >= 8 &&
            expr("(1000000 * n_chars) div n_bpe") >= 9000000L)
        // 2. exact dedup: canonical copy = min doc_id per fingerprint
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))
        val deduped = quality
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        // 3. mixture: the q141 per-source quota, same salted hash
        val quota = element_at(array(lit(20L), lit(50L), lit(80L)),
          (regexp_replace(col("source"), "[^0-9]", "").cast("bigint")
            % 3 + 1).cast("int"))
        val sampled = deduped
          .filter(hash60(
            concat(lit("mix|"), col("doc_id").cast("string"))) % 100
            < quota)
          .select(col("doc_id"), col("source"), col("n_bpe"))
        // 4. pack survivors head-to-tail per source
        graft.ops.Packing.pack(sampled, "source", "doc_id", "n_bpe",
          budget)
      },
      Some {
        val h = "CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
        val q = """[20, 50, 80][CAST(CAST(regexp_replace(source, '[^0-9]', '', 'g')
          |         AS BIGINT) % 3 + 1 AS INT)]""".stripMargin
        s"""WITH ${graft.ops.Bpe.dtFixtureCte},
           |base AS (SELECT d.doc_id, d.source, dt.n_bpe,
           |           CAST(length(${TextQueries.normSql}) AS BIGINT)
           |             AS n_chars,
           |           ${TextQueries.hash60Sql(TextQueries.normSql)} AS fp
           |         FROM documents d JOIN dt USING (doc_id)),
           |quality AS (SELECT * FROM base
           |            WHERE n_bpe >= 8
           |              AND (1000000 * n_chars) // n_bpe >= 9000000),
           |dd AS (SELECT doc_id, source, n_bpe FROM (
           |         SELECT *, row_number() OVER (PARTITION BY fp
           |                                      ORDER BY doc_id) AS rn
           |         FROM quality) WHERE rn = 1),
           |sam AS (SELECT doc_id, source, n_bpe FROM dd
           |        WHERE $h < $q)
           |SELECT doc_id, source, n_bpe,
           |  CAST(start_off // $budget AS BIGINT) AS seq_id,
           |  CAST(start_off % $budget AS BIGINT) AS seq_off
           |FROM (
           |  SELECT doc_id, source, n_bpe,
           |    COALESCE(SUM(n_bpe)
           |      OVER (PARTITION BY source ORDER BY doc_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS start_off
           |  FROM sam)""".stripMargin
      })
  }

  /** q176 — CROSS-DOC EXACT-SUBSTRING DEDUP (the EXACTSUBSTR shape
    * of Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): find every maximal token span that is covered
    * by word $substrK-grams appearing in ≥ 2 DISTINCT documents — the
    * operator that removes verbatim boilerplate/quotation overlap
    * which document- (q18) and paragraph-level (q63) dedup cannot
    * see. Suffix arrays are the single-machine formulation; the
    * Spark-first reading is the inverted n-gram index:
    *
    *  1. normalize + tokenize (the q18 fingerprint normalization);
    *  2. rolling $substrK-gram per position — a map-side generate;
    *  3. grams in ≥2 docs via one groupBy on the gram (the inverted-
    *     index shuffle — at 100 TB the key becomes xxhash64(gram),
    *     kept as the string here for bit-exact oracle parity);
    *  4. covered token positions = dup-gram starts × k offsets;
    *  5. maximal spans via gaps-and-islands (per-doc window).
    *
    * Output per affected doc: span count, duplicated-token count,
    * total tokens — the removal ledger (the cleaned corpus is one
    * `slice` away; counts make the hash check exact). Scale notes:
    * every stage is keyed shuffle or per-doc window; ultra-common
    * grams skew the dup-join — production salts that join or caps
    * gram document-frequency (the q19 DF-cap precedent). */
  val q176 = {
    val substrK = 8
    Q("q176_substring_dedup",
      (s, d) => {
        val toks = Catalog.documentsSpread(s, d)
          .select(col("doc_id"),
            split(normalizeText(col("text")), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val grams = toks.select(col("doc_id"),
            posexplode(expr(
              s"""CASE WHEN n >= $substrK
                 |THEN transform(sequence(1, n - ${substrK - 1}),
                 |  p -> array_join(slice(w, p, $substrK), ' '))
                 |ELSE CAST(array() AS array<string>) END""".stripMargin)))
          .select(col("doc_id"), (col("pos") + 1).as("p"),
            col("col").as("gram"))
        val dup = grams.groupBy(col("gram"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("gram"))
        // islands straight from the matched gram POSITIONS (r18): a
        // position p covers tokens [p, p+K-1], so two matches merge
        // into one island iff their gap is ≤ K, and the island's
        // covered-token count is max(p) − min(p) + K. Identical to
        // exploding every covered token and re-deduping — minus the
        // K× row blow-up and the distinct's full shuffle.
        val matched = grams.join(dup, "gram")
          .select(col("doc_id"), col("p"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        val spans = matched
          .withColumn("newi",
            when(col("p") - lag(col("p"), 1).over(w) <= substrK, 0)
              .otherwise(1))
          .withColumn("island", sum(col("newi")).over(w))
          .groupBy(col("doc_id"), col("island"))
          .agg((max(col("p")) - min(col("p")) + substrK)
            .cast("bigint").as("span_len"))
        spans.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("span_len")).as("n_dup_tokens"))
          .join(toks.select(col("doc_id"), col("n")), "doc_id")
          .select(col("doc_id"), col("n_spans"), col("n_dup_tokens"),
            col("n").cast("bigint").as("n_tokens"))
      },
      Some(
        s"""WITH t AS (SELECT doc_id,
           |             string_split(${TextQueries.normSql}, ' ') AS w
           |           FROM documents),
           |tk AS (SELECT doc_id, w, len(w) AS n FROM t),
           |g AS (SELECT doc_id, p,
           |        list_aggregate(w[p:p + ${substrK - 1}], 'string_agg', ' ')
           |          AS gram
           |      FROM tk, unnest(generate_series(1, greatest(n - ${substrK - 1}, 0)))
           |        AS u(p)),
           |dup AS (SELECT gram FROM g GROUP BY gram
           |        HAVING count(DISTINCT doc_id) >= 2),
           |cov AS (SELECT DISTINCT s.doc_id, v.tt AS t
           |        FROM (SELECT g.doc_id, g.p FROM g JOIN dup USING (gram)) s,
           |             unnest(generate_series(s.p, s.p + ${substrK - 1}))
           |               AS v(tt)),
           |isl AS (SELECT doc_id, t,
           |          CASE WHEN t - lag(t) OVER (PARTITION BY doc_id
           |                                     ORDER BY t) = 1
           |               THEN 0 ELSE 1 END AS newi
           |        FROM cov),
           |isl2 AS (SELECT doc_id,
           |           sum(newi) OVER (PARTITION BY doc_id ORDER BY t)
           |             AS island
           |         FROM isl),
           |spans AS (SELECT doc_id, island, count(*) AS span_len
           |          FROM isl2 GROUP BY 1, 2)
           |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |  CAST(sum(sp.span_len) AS BIGINT) AS n_dup_tokens,
           |  CAST(max(tk.n) AS BIGINT) AS n_tokens
           |FROM spans sp JOIN tk ON sp.doc_id = tk.doc_id
           |GROUP BY 1""".stripMargin))
  }

  /** q185 — FILL-IN-MIDDLE TRANSFORM (the FIM pretraining data op for
    * code/infilling models): each document's token stream splits at
    * n/3 and 2n/3 into (prefix, middle, suffix), then re-serializes
    * with sentinel markers in PSM order (`<PRE> P <SUF> S <MID> M` —
    * the model learns the middle from both sides) or SPM order
    * (`<SUF> S <PRE> P <MID> M`), deterministically alternating by
    * doc_id parity the way real pipelines mix the two modes. The full
    * reordered stream is emitted ('|'-joined, injective over the
    * corpus alphabet), so the oracle pins the transform token-exactly,
    * not just the segment lengths.
    *
    * Scale shape: pure array-local row arithmetic — slice/concat inside
    * the row, zero shuffles, scan speed. Docs with <3 tokens can't
    * split three ways and are excluded (mirrored in the oracle). */
  val q185 = Q("q185_fim_transform",
    (s, d) => {
      val t = tokens(col("text"))
      Catalog.documents(s, d)
        .select(col("doc_id"), t.as("t"),
          size(t).cast("bigint").as("n"))
        .filter(col("n") >= 3)
        .select(col("doc_id"),
          expr("n div 3").as("c1"), expr("(2 * n) div 3").as("c2"),
          col("n"), col("t"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, "psm").otherwise("spm")
            .as("fim_order"),
          col("c1").as("n_prefix"), (col("c2") - col("c1")).as("n_middle"),
          (col("n") - col("c2")).as("n_suffix"),
          array_join(
            when(col("doc_id") % 2 === 0,
              concat(array(lit("<PRE>")),
                slice(col("t"), lit(1), col("c1").cast("int")),
                array(lit("<SUF>")),
                slice(col("t"), (col("c2") + 1).cast("int"),
                  (col("n") - col("c2")).cast("int")),
                array(lit("<MID>")),
                slice(col("t"), (col("c1") + 1).cast("int"),
                  (col("c2") - col("c1")).cast("int"))))
              .otherwise(
                concat(array(lit("<SUF>")),
                  slice(col("t"), (col("c2") + 1).cast("int"),
                    (col("n") - col("c2")).cast("int")),
                  array(lit("<PRE>")),
                  slice(col("t"), lit(1), col("c1").cast("int")),
                  array(lit("<MID>")),
                  slice(col("t"), (col("c1") + 1).cast("int"),
                    (col("c2") - col("c1")).cast("int")))),
            "|").as("fim_str"))
    },
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, $tokSqlArr AS t,
         |    CAST(len($tokSqlArr) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, t, n, n // 3 AS c1, (2 * n) // 3 AS c2
         |      FROM d WHERE n >= 3)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS fim_order,
         |  c1 AS n_prefix, c2 - c1 AS n_middle, n - c2 AS n_suffix,
         |  array_to_string(
         |    CASE WHEN doc_id % 2 = 0
         |      THEN ['<PRE>'] || t[1:c1] || ['<SUF>'] ||
         |             t[c2 + 1:n] || ['<MID>'] || t[c1 + 1:c2]
         |      ELSE ['<SUF>'] || t[c2 + 1:n] || ['<PRE>'] ||
         |             t[1:c1] || ['<MID>'] || t[c1 + 1:c2] END,
         |    '|') AS fim_str
         |FROM c""".stripMargin))

  val all: Seq[Q] = Seq(q79, q80, q81, q82, q83, q86, q87, q88, q91, q93,
    q99, q100, q140, q142, q143, q157, q176, q185)
}
