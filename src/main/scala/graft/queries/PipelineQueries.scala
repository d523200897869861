package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}
import graft.tables.Catalog

/** The end-to-end training-data prep pipeline as one verifiable query —
  * the composite this engine exists for: quality gate → exact dedup
  * (keep min doc_id per content fingerprint) → near-dup removal (drop
  * the higher doc_id of every MinHash-LSH candidate pair) → per-language
  * token accounting of the surviving corpus.
  *
  * Scale shape: the quality gate and fingerprints are map-side; exact
  * dedup is one shuffle; LSH candidates bound the near-dup work; the
  * final accounting is a small aggregation. Nothing in the pipeline is
  * ever O(corpus²).
  */
object PipelineQueries {

  private val minQuality = 0.5

  val q41 = Q("q41_training_prep",
    (s, d) => {
      // plain scan (r19 revert of the r18 spread): Catalyst pushes the
      // quality filter BELOW the round-robin exchange (ADVICE r18), so
      // the regex scoring ran in the single-task scan stage either way
      // and the exchange only re-dealt survivors the fp window was
      // about to shuffle again; driver window +12% with spread, and the
      // same-box isolated A/B reads plain 1.43 vs spread 1.86 (min-of-5
      // fresh-JVM runs)
      val docs = Catalog.documents(s, d)
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= minQuality)
        .select(col("doc_id"), col("lang"), col("text"))

      // exact dedup: keep the min doc_id per content fingerprint.
      // The window form shuffles the text payload by fp ONCE — and the
      // r18 A/B kept it: a decide-on-narrow-rows + anti-join form
      // (shuffle (doc_id, fp) only) recomputes the quality regexes on
      // a second scan branch, and compute dominates here (2.2 s window
      // vs 5.5 s narrow same-box; the fp exchange is ~3 MB at sf0.1).
      // pinned (r19): keep is consumed TWICE — the LSH-candidates
      // branch and the anti-join left side — so unpinned, the whole
      // scan → quality regexes → fp window pipeline ran once per
      // branch (the q24/q68 re-expansion shape); pinned it runs once
      val keep = docs
        .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
        .withColumn("keep_id", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id"))
        .drop("fp", "keep_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // near-dup removal: drop the higher id of each LSH candidate pair
      // candidate drops ≈ near-dup count ≪ corpus — broadcast the anti
      // side (stats can't see through the LSH pipeline and pick SMJ)
      val drops = broadcast(Dedup.minhashCandidates(keep, 3)
        .select(col("doc_b").as("drop_id")).distinct())
      val clean = keep.join(drops, keep("doc_id") === drops("drop_id"),
        "left_anti")

      clean.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("bigint")).as("n_tokens"))
    },
    Some {
      // mirrors TextQueries' generated fragments
      val tokSql = """len(regexp_split_to_array(text, '\s+'))"""
      val stopHits = TextAnalysis.langMarkers.head._2
        .map(m => s"(length((' ' || text || ' ')) - length(replace((' ' || text || ' '), '$m', ''))) / ${m.length}")
        .mkString(" + ")
      val qualitySql =
        s"""least(CAST($tokSql AS DOUBLE) / 100.0, 1.0) * 0.3
           | + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           |    / nullif(CAST(length(text) AS DOUBLE), 0)) * 0.4
           | + least((CAST($stopHits AS DOUBLE)
           |    / nullif(CAST($tokSql AS DOUBLE), 0)) * 5.0, 1.0) * 0.3""".stripMargin
      val normSql =
        """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))"""
      val sigCols = Dedup.minhashParams.zipWithIndex.map {
        case ((a, c), k) => s"min((h * $a + $c) % ${Dedup.P}) AS mh$k"
      }.mkString(", ")
      val bands = (0 until Dedup.bandsOf).map { j =>
        s"SELECT doc_id, $j AS band, md5(CAST(mh${2 * j} AS VARCHAR) || '_' || CAST(mh${2 * j + 1} AS VARCHAR)) AS bh FROM sigs"
      }.mkString(" UNION ALL ")
      s"""WITH q AS (SELECT doc_id, lang, text FROM documents
         |           WHERE $qualitySql >= $minQuality),
         |keep AS (SELECT doc_id, lang, text FROM (
         |  SELECT *, min(doc_id) OVER (PARTITION BY md5($normSql)) AS keep_id
         |  FROM q) WHERE doc_id = keep_id),
         |shingles AS (
         |  SELECT t.doc_id, u.shingle
         |  FROM (SELECT doc_id,
         |          list_transform(generate_series(1, len(toks) - 2),
         |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs
         |        FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
         |              FROM keep)) t, unnest(t.shs) u(shingle)),
         |hashed AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % ${Dedup.P} AS h
         |  FROM shingles),
         |sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id),
         |bands AS ($bands),
         |drops AS (SELECT DISTINCT b.doc_id AS drop_id
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |clean AS (SELECT k.* FROM keep k
         |          WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drop_id = k.doc_id))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum($tokSql) AS BIGINT) AS n_tokens
         |FROM clean GROUP BY 1""".stripMargin
    })

  /** q42 — as-of (point-in-time) join: every event picks up the latest
    * daily purchase stat at or before its timestamp. Verified against
    * DuckDB's NATIVE ASOF LEFT JOIN — an independent implementation of
    * the semantics, not a mirrored formulation. */
  val q42 = Q("q42_asof_join",
    (s, d) => {
      val e = Catalog.events(s, d)
      val left = e.select(col("user_id"), col("event_id"), col("ts"))
      val right = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          date_trunc("day", col("ts")).as("rts"))
        .agg(max(round(col("value") * 100).cast("bigint")).as("cents"))
      graft.ops.AsOfJoin(left, right, key = "user_id",
        leftTs = "ts", rightTs = "rts", valueCols = Seq("cents"),
        leftOrder = Seq("event_id"))
    },
    Some(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type, value
        |           FROM events),
        |r AS (SELECT user_id, date_trunc('day', ts) AS rts,
        |             max(CAST(round(value * 100) AS BIGINT)) AS cents
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.user_id, e.event_id, e.ts, r.cents
        |FROM e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.rts""".stripMargin))

  /** q46 — deterministic train/val/test split: bucket by the 60-bit
    * content-independent key hash (salted with a split tag so other
    * hash uses don't correlate), 80/10/10. Reproducible across runs,
    * engines, and partitionings — the eval-split primitive. */
  val q46 = Q("q46_train_val_test_split",
    (s, d) => {
      val bucket = TextAnalysis.hash60(
        concat(lit("split|"), col("doc_id").cast("string"))) % 100
      Catalog.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("bigint"))
            .as("n_tokens"))
    },
    Some {
      val h = "CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
      s"""SELECT CASE WHEN $h < 80 THEN 'train'
         |            WHEN $h < 90 THEN 'val' ELSE 'test' END AS split,
         |       lang, count(*) AS n_docs,
         |       CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         |         AS n_tokens
         |FROM documents GROUP BY 1, 2""".stripMargin
    })

  /** q47 — source-mixture sampling: per-source keep quotas applied via
    * the same deterministic hash — proportional downsampling without a
    * shuffle or rand(). */
  val q47 = Q("q47_source_mixture",
    (s, d) => {
      val quota = (element_at(
        array(lit(20L), lit(50L), lit(80L)),
        (col("source_num") % 3 + 1).cast("int")))
      val keepHash = TextAnalysis.hash60(
        concat(lit("mix|"), col("doc_id").cast("string"))) % 100
      Catalog.documents(s, d)
        .withColumn("source_num",
          regexp_replace(col("source"), "[^0-9]", "").cast("bigint"))
        .withColumn("quota", quota)
        .filter(keepHash < col("quota"))
        .groupBy(col("source"), col("quota"))
        .agg(count(lit(1)).as("n_kept"))
    },
    Some {
      val h = "CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
      s"""SELECT source,
         |       CAST([20, 50, 80][CAST(CAST(regexp_replace(source, '[^0-9]', '', 'g')
         |         AS BIGINT) % 3 + 1 AS INT)] AS BIGINT) AS quota,
         |       count(*) AS n_kept
         |FROM documents
         |WHERE $h < [20, 50, 80][CAST(CAST(regexp_replace(source, '[^0-9]', '', 'g')
         |         AS BIGINT) % 3 + 1 AS INT)]
         |GROUP BY 1, 2""".stripMargin
    })

  /** q77 — deterministic STRATIFIED SUBSAMPLE: the n smallest salted
    * hash ranks per language — "give me a reproducible 50-doc sample per
    * stratum" without rand() (which no two engines, or even two Spark
    * runs with different partitionings, would agree on). Runs through
    * the custom [[graft.plans.TopKPerGroup]] operator, so the per-stratum
    * selection is heap-bounded map-side — no per-group sort, and the
    * shuffle carries at most groups·n rows per mapper: exactly how a
    * 100 TB corpus gets subsampled. Oracle = the window formulation. */
  val q77 = {
    val n = 50
    Q("q77_stratified_sample",
      (s, d) => {
        val ranked = Catalog.documents(s, d).select(col("doc_id"),
          col("lang"),
          TextAnalysis.hash60(concat(lit("sample|"),
            col("doc_id").cast("string"))).as("rk"))
        graft.plans.TopKPerGroup(ranked, n, Seq(col("lang")),
          Seq(col("rk").asc, col("doc_id").asc))
      },
      Some(
        s"""SELECT doc_id, lang, rk FROM (
           |  SELECT doc_id, lang, rk,
           |    row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id)
           |      AS rn
           |  FROM (SELECT doc_id, lang,
           |          CAST(('0x' || substr(md5('sample|'
           |            || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
           |        FROM documents)) WHERE rn <= $n""".stripMargin))
  }

  /** q123 — DETERMINISTIC FIXED-K PER-GROUP SAMPLE (the reservoir-sample
    * analog for reproducible pipelines): the k "random" docs per source
    * are the k smallest salted hashes — stable across runs, engines and
    * partitionings, unlike rand()/reservoir state. One keyed window
    * (rank ≤ k) is the whole query; at 100 TB swap the window for
    * [[graft.plans.TopKPerGroup]]'s map-side heap trim — same result,
    * no per-group sort. */
  val q123 = Q("q123_group_sample",
    (s, d) => {
      val h = TextAnalysis.hash60(
        concat(lit("sample|"), col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(h, col("doc_id"))
      Catalog.documents(s, d)
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 32)
        .select(col("source"), col("rk"), col("doc_id"), col("lang"))
    },
    Some {
      val h = "CAST(('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
      s"""SELECT source, rk, doc_id, lang FROM (
         |  SELECT source, doc_id, lang,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY $h, doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |WHERE rk <= 32""".stripMargin
    })

  /** q141 — TOKEN-BUDGET MIXTURE ACCOUNTING: q47's deterministic
    * quota-hash mixture, re-answered in the unit users budget by — the
    * BPE token YIELD each source contributes after sampling (mixture
    * weights are specified in tokens, not documents; a source of long
    * docs at quota 20 can out-contribute one of short docs at 80).
    * Same no-shuffle-no-rand sampling (salted hash vs per-source
    * quota), one map-side subword count, one keyed aggregation. */
  val q141 = {
    Q("q141_token_budget_mixture",
      (s, d) => {
        val quota = element_at(
          array(lit(20L), lit(50L), lit(80L)),
          (col("source_num") % 3 + 1).cast("int"))
        val keepHash = TextAnalysis.hash60(
          concat(lit("mix|"), col("doc_id").cast("string"))) % 100
        Catalog.documents(s, d)
          .withColumn("source_num",
            regexp_replace(col("source"), "[^0-9]", "").cast("bigint"))
          .withColumn("quota", quota)
          .filter(keepHash < col("quota"))
          .groupBy(col("source"), col("quota"))
          .agg(count(lit(1)).as("n_kept"),
            sum(graft.ops.Bpe.tokenCount(col("text")).cast("bigint"))
              .as("bpe_tokens"))
      },
      Some {
        val h = "CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
        val q = """[20, 50, 80][CAST(CAST(regexp_replace(source, '[^0-9]', '', 'g')
          |         AS BIGINT) % 3 + 1 AS INT)]""".stripMargin
        s"""WITH ${graft.ops.Bpe.dtFixtureCte}
           |SELECT source, CAST($q AS BIGINT) AS quota,
           |       count(*) AS n_kept,
           |       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens
           |FROM documents JOIN dt USING (doc_id)
           |WHERE $h < $q
           |GROUP BY 1, 2""".stripMargin
      })
  }

  /** q154 — TEMPERATURE-SCALED MIXTURE PLANNER: the standard
    * multilingual/multi-source rebalancing act (exponent-α sampling of
    * mBERT/XLM-R: q_i ∝ p_i^α flattens the source distribution so big
    * sources stop drowning small ones). α = 1/2 keeps every step EXACT
    * across engines: p_i^½ ∝ sqrt(n_tokens_i) (the common Σn factor
    * cancels), sqrt is IEEE-correctly-rounded in both engines, and
    * everything after the one rounding lives in integer arithmetic —
    * micro-unit weights, an integer-division token quota against a
    * half-corpus budget, and a ppm sampling rate capped at 1e6
    * (a small source can be asked for everything it has, never more).
    * Scale shape: one map-side-combinable groupBy(source) over the
    * token counts + a 1-row broadcast of the totals — the planner's
    * output is |sources| rows that drive the q47/q141 hash-samplers. */
  val q154 = Q("q154_temperature_mixture",
    (s, d) => {
      val bySource = Catalog.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.Bpe.tokenCount(col("text")).cast("bigint"))
            .as("n_tokens"))
        .withColumn("w",
          round(sqrt(col("n_tokens").cast("double")) * 1000).cast("bigint"))
      val tot = bySource.agg(sum(col("w")).cast("bigint").as("w_total"),
        sum(col("n_tokens")).cast("bigint").as("t_total"))
      bySource.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
          expr("CAST(((t_total div 2) * w) div w_total AS BIGINT)")
            .as("quota_tokens"),
          expr("""CAST(least(1000000,
                 |  (1000000 * (((t_total div 2) * w) div w_total))
                 |    div n_tokens) AS BIGINT)""".stripMargin)
            .as("rate_ppm"))
    },
    Some(
      s"""WITH ${graft.ops.Bpe.dtFixtureCte},
         |per AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(dt.n_bpe) AS BIGINT) AS n_tokens
         |        FROM documents d JOIN dt USING (doc_id) GROUP BY 1),
         |w AS (SELECT *,
         |        CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT)
         |          AS w
         |      FROM per),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total,
         |          CAST(sum(n_tokens) AS BIGINT) AS t_total FROM w)
         |SELECT source, n_docs, n_tokens, w,
         |  CAST(((t_total // 2) * w) // w_total AS BIGINT) AS quota_tokens,
         |  CAST(least(1000000,
         |    (1000000 * (((t_total // 2) * w) // w_total)) // n_tokens)
         |    AS BIGINT) AS rate_ppm
         |FROM w, tot""".stripMargin))

  /** q183 — SFT CHAT FLATTENING + LOSS MASKING: the supervised-
    * fine-tuning data-prep op. Each document's token stream is cut into
    * alternating user/assistant turns (12 tokens per turn), every turn
    * carries its loss-token count (assistant turns train, user turns are
    * masked to 0 — the standard SFT loss mask), and turns are laid
    * head-to-tail on a 32-token sequence grid using the START-OFFSET
    * convention (q79's packing shape): a turn belongs to the sequence
    * where its first token lands, so turn bookkeeping never splits and
    * a sequence holds at most 32 + turnTok − 1 tokens — a grid
    * assignment, not a hard 32-token capacity.
    *
    * Scale shape: turn extraction is array-local row arithmetic (one
    * generate-series per doc, no shuffle); the sequence assignment is a
    * per-doc cumulative-sum window — partitioned by doc_id, so it scales
    * with documents, not corpus length. All counts are exact integers.
    */
  val q183 = {
    val turnTok = 12L
    val seqCap = 32L
    Q("q183_chat_sft_prep",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val turns = Catalog.documents(s, d)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n"))
          .select(col("doc_id"), col("n"),
            explode(sequence(lit(0L),
              expr(s"(n + ${turnTok - 1}) div $turnTok - 1"))).as("turn_idx"))
          .select(col("doc_id"), col("turn_idx"),
            when(col("turn_idx") % 2 === 0, "user").otherwise("assistant")
              .as("role"),
            least(lit(turnTok), col("n") - col("turn_idx") * turnTok)
              .as("n_tokens"))
        turns
          .withColumn("off",
            coalesce(sum(col("n_tokens")).over(
              Window.partitionBy(col("doc_id")).orderBy(col("turn_idx"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("n_tokens"),
            when(col("role") === "assistant", col("n_tokens"))
              .otherwise(lit(0L)).as("loss_tokens"),
            expr(s"off div $seqCap").as("seq_id"))
      },
      Some(
        s"""WITH docs AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
           |  FROM documents),
           |turns AS (
           |  SELECT doc_id, i AS turn_idx,
           |    CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
           |    least($turnTok, n - i * $turnTok) AS n_tokens
           |  FROM (SELECT doc_id, n,
           |          unnest(generate_series(0, (n + ${turnTok - 1}) // $turnTok - 1)) AS i
           |        FROM docs))
           |SELECT doc_id, turn_idx, role, n_tokens,
           |  CASE WHEN role = 'assistant' THEN n_tokens
           |       ELSE CAST(0 AS BIGINT) END AS loss_tokens,
           |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id
           |    ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND 1 PRECEDING), 0) // $seqCap AS BIGINT) AS seq_id
           |FROM turns""".stripMargin))
  }

  /** q184 — GROUP-RELATIVE ADVANTAGE (the GRPO reward-normalization
    * prep): within each (lang, source) group — the prompt-group proxy —
    * normalize a per-document reward to advantage (r − mean)/std as
    * (r·n − S) / sqrt(n·Q − S²) from the three group sums (n, S = Σr,
    * Q = Σr²). The SUMS are exact int64 (milli-scale reward keeps
    * Q ≤ n·10⁶, overflow-free to ~10¹²-doc groups) with no
    * accumulation-order dependence; the discriminant n·Q − S² is then
    * computed in DOUBLE — a single fixed-shape IEEE expression, so both
    * engines produce bit-identical values even where n·Q would overflow
    * int64 (n ≳ 3000 at this reward scale) — and clamped to advantage 0
    * when non-positive (true zero variance, or cancellation rounding).
    *
    * Scale shape: one map-side-combinable aggregation to a groups-sized
    * relation, broadcast back over the scan. Never a shuffle of the
    * corpus by group key.
    */
  val q184 = Q("q184_group_advantage",
    (s, d) => {
      val scored = Catalog.documents(s, d).select(
        col("doc_id"), col("lang"), col("source"),
        round(TextAnalysis.alphaRatio(col("text")) * 1e3)
          .cast("bigint").as("reward"))
      val g = scored.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("gn"), sum(col("reward")).as("gs"),
          sum(col("reward") * col("reward")).as("gq"))
      val disc = col("gn").cast("double") * col("gq").cast("double") -
        col("gs").cast("double") * col("gs").cast("double")
      scored.join(broadcast(g), Seq("lang", "source"))
        .select(col("doc_id"), col("lang"), col("source"), col("reward"),
          when(disc <= 0, lit(0L))
            .otherwise(round(
              (col("reward") * col("gn") - col("gs")).cast("double")
                / sqrt(disc) * 1e6).cast("bigint"))
            .as("adv_micro"))
    },
    Some(
      """WITH scored AS (
        |  SELECT doc_id, lang, source,
        |    CAST(round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |        AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0)
        |      * 1000) AS BIGINT) AS reward
        |  FROM documents),
        |g AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS gn,
        |        sum(reward) AS gs, sum(reward * reward) AS gq
        |      FROM scored GROUP BY 1, 2)
        |SELECT doc_id, lang, source, reward,
        |  CASE WHEN CAST(gn AS DOUBLE) * CAST(gq AS DOUBLE)
        |         - CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE) <= 0
        |       THEN CAST(0 AS BIGINT)
        |       ELSE CAST(round(CAST(reward * gn - gs AS DOUBLE)
        |         / sqrt(CAST(gn AS DOUBLE) * CAST(gq AS DOUBLE)
        |             - CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE)) * 1000000)
        |         AS BIGINT) END AS adv_micro
        |FROM scored JOIN g USING (lang, source)""".stripMargin))

  /** q193 — CURRICULUM SCHEDULE: order the corpus for staged training —
    * phase 1..4 by global LM-perplexity quartile (easy → hard, the
    * curriculum-learning recipe), then a deterministic within-phase
    * shuffle expressed as (shard, pos): shard = hash60(doc_id) mod 64,
    * pos = rank within (phase, shard) by (hash, doc_id). A trainer reads
    * phase-major, shard-round-robin — the schedule is fully determined
    * by the data, never by rand() or a global sort.
    *
    * Scale shape: quartile cutoffs come off the global milli-histogram
    * (bounded grid, q188's technique) and broadcast back; the only
    * per-row window is partitioned by (phase × shard) = 256 balanced
    * partitions — no single-partition global row_number anywhere.
    */
  val q193 = Q("q193_curriculum_schedule",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = TextQueries.bigramNll(s, d)
        .withColumn("nll_milli", expr("nll_micro div 1000")) // ≥0
        .withColumn("h",
          TextAnalysis.hash60(col("doc_id").cast("string")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // cumulative histogram via the keyed two-phase form (GridCum,
      // r19): the old global ORDER BY window put the whole milli-grid
      // through one task
      val cuts = graft.ops.GridCum.withCum(
          scored.groupBy(col("nll_milli")).agg(count(lit(1)).as("c")),
          col("nll_milli"), "c", "cum")
        .crossJoin(broadcast(scored.agg(count(lit(1)).as("tot"))))
        .agg(
          min(when(col("cum") * 4 >= col("tot"), col("nll_milli"))).as("c1"),
          min(when(col("cum") * 4 >= col("tot") * 2, col("nll_milli")))
            .as("c2"),
          min(when(col("cum") * 4 >= col("tot") * 3, col("nll_milli")))
            .as("c3"))
      val phased = scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("h"),
          when(col("nll_milli") <= col("c1"), 1L)
            .when(col("nll_milli") <= col("c2"), 2L)
            .when(col("nll_milli") <= col("c3"), 3L)
            .otherwise(4L).as("phase"),
          (col("h") % 64).as("shard"))
      val wPos = Window.partitionBy(col("phase"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      phased.select(col("doc_id"), col("phase"),
        col("shard").cast("bigint").as("shard"),
        row_number().over(wPos).cast("bigint").as("pos"))
    },
    Some(
      s"""WITH ${TextQueries.nllCtes},
         |sm AS MATERIALIZED (SELECT doc_id, nll_micro // 1000 AS nll_milli,
         |         ${TextQueries.hash60Sql("CAST(doc_id AS VARCHAR)")} AS h
         |       FROM score),
         |hist AS (SELECT nll_milli, count(*) AS c FROM sm GROUP BY 1),
         |cum AS (SELECT nll_milli,
         |          sum(c) OVER (ORDER BY nll_milli) AS cum
         |        FROM hist),
         |tot AS (SELECT count(*) AS tot FROM sm),
         |cuts AS (SELECT
         |    min(CASE WHEN cum * 4 >= tot THEN nll_milli END) AS c1,
         |    min(CASE WHEN cum * 4 >= 2 * tot THEN nll_milli END) AS c2,
         |    min(CASE WHEN cum * 4 >= 3 * tot THEN nll_milli END) AS c3
         |  FROM cum, tot),
         |phased AS (
         |  SELECT doc_id, h,
         |    CASE WHEN nll_milli <= c1 THEN 1
         |         WHEN nll_milli <= c2 THEN 2
         |         WHEN nll_milli <= c3 THEN 3
         |         ELSE 4 END AS phase,
         |    h % 64 AS shard
         |  FROM sm, cuts)
         |SELECT doc_id, CAST(phase AS BIGINT) AS phase,
         |  CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY phase, shard
         |    ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM phased""".stripMargin))

  /** q209 — BATCHED SYNTHETIC-DATA GENERATION (the "generate" member
    * of the embed/score/generate triple, completing the model seam):
    * each document seeds a greedy autoregressive continuation from the
    * STORED corpus bigram LM ([[graft.ops.LmCounts]] — trained once
    * per generation, the same store q178/q202 score with): token t+1 =
    * argmax-count successor of token t (ties to the lexicographically
    * smallest successor), up to 8 tokens or a dead end. Decoding runs
    * through [[graft.ops.ModelInference.generate]] — seeds batch
    * inside each partition, the decoder is invoked once per batch, and
    * the vocabulary-sized successor table ships to executors ONCE as a
    * Spark broadcast, exactly as model weights ship to a GPU worker.
    * The oracle replays the whole chain declaratively: successor table
    * by window rank over the recomputed bigram counts, then 8 unrolled
    * LEFT-JOIN steps (a dead end propagates NULLs; concat_ws skips
    * them in both engines).
    *
    * Scale shape: the successor table is vocabulary-sized (the BPE
    * merge-table / k-means codebook precedent for bounded driver
    * state); generation itself is ONE corpus scan with zero shuffles —
    * per-row work is O(maxTokens) map lookups. A trillion-row corpus
    * generates in a single embarrassingly parallel pass. */
  val q209 = {
    val maxTok = 8
    Q("q209_synthetic_generation",
      (s, d) => {
        import graft.ops.ModelInference
        import org.apache.spark.sql.expressions.Window
        val (bc, _) = graft.ops.LmCounts.stored(s, d)
        val succ = bc.withColumn("rn", row_number().over(
            Window.partitionBy(col("w1"))
              .orderBy(col("cb").desc, col("w2"))))
          .filter(col("rn") === 1)
          .select(col("w1"), col("w2"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val bcSucc = s.sparkContext.broadcast(succ)
        val seeds = Catalog.documents(s, d)
          .select(col("doc_id"),
            element_at(TextAnalysis.tokens(col("text")), -1).as("seed"))
        val batch = s.conf.get(ModelInference.batchSizeKey,
          ModelInference.defaultBatchSize.toString).toInt
        ModelInference.generate(seeds, "seed",
            new ModelInference.GreedyBigramGenerator(bcSucc, maxTok), batch)
          .select(col("doc_id"),
            array_join(col("gen"), " ").as("gen_text"),
            size(col("gen")).cast("bigint").as("n_gen"))
      },
      Some {
        val steps = (1 to maxTok).map { k =>
          val prev = if (k == 1) "g0.seed" else s"g${k - 1}.t${k - 1}"
          s"g$k AS (SELECT g${k - 1}.*, s$k.w2 AS t$k\n" +
            s"  FROM g${k - 1} LEFT JOIN succ s$k ON $prev = s$k.w1)"
        }
        val nGen = (1 to maxTok)
          .map(k => s"(CASE WHEN t$k IS NULL THEN 0 ELSE 1 END)")
          .mkString(" + ")
        val ts = (1 to maxTok).map(k => s"t$k").mkString(", ")
        s"""WITH docs AS (
           |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
           |  FROM documents),
           |bi AS (
           |  SELECT t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM docs WHERE len(t) >= 2)),
           |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
           |succ AS (
           |  SELECT w1, w2 FROM (
           |    SELECT w1, w2, row_number() OVER (
           |      PARTITION BY w1 ORDER BY cb DESC, w2) AS rn
           |    FROM bc) WHERE rn = 1),
           |seeds AS (SELECT doc_id, t[len(t)] AS seed FROM docs),
           |g0 AS (SELECT doc_id, seed FROM seeds),
           |${steps.mkString(",\n")}
           |SELECT doc_id,
           |  concat_ws(' ', $ts) AS gen_text,
           |  CAST($nGen AS BIGINT) AS n_gen
           |FROM g$maxTok""".stripMargin
      })
  }

  val all: Seq[Q] = Seq(q41, q42, q46, q47, q77, q123, q141, q154, q183,
    q184, q193, q209)
}
