package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.tables.Catalog

/** The dedup family as verifiable queries: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup. The testdata has no
  * duplicates (FIXTURES.md), so each query injects them deterministically
  * (a shifted-id copy of every 4th/5th row) — the identical injection
  * appears in the oracle, which defines the contract.
  *
  * All signature SQL (minhash columns, simhash bit-sums, LSH bands) is
  * GENERATED from the same parameter declarations `graft.ops.Dedup`
  * uses, so Spark and oracle cannot drift.
  */
object DedupQueries {
  import Dedup.{P, bandsOf, minhashParams, simhashBits}

  // ---- corpora with injected duplicates (Spark + SQL in lockstep) ----

  private def docsExact(s: SparkSession, d: String): DataFrame = {
    val docs = Catalog.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionAll(docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  private val docsExactSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0""".stripMargin

  /** `spread = true` rebalances the scan (Catalog.documentsSpread)
    * before the downstream shingle construction; each consumer picks
    * by measurement. As of r19 every docsNear consumer measures PLAIN
    * as at-least-as-fast: the minhash family's first shuffle (band/
    * signature groupBy) re-partitions everything regardless, so the
    * up-front exchange is pure cost — q19 reverted in r18 (spread
    * 2.22 s vs plain 1.45 s same-box), q194 in r19 (driver window
    * 1.44 → 1.69 with spread; isolated A/B flat-to-worse), and q78's
    * prefix-filtered pruning prefers the unexchanged scan order
    * (1.53 → ~2.0 with spread, r18). The flag stays for corpora whose
    * layout genuinely under-splits a compute-dense consumer. */
  private[queries] def docsNear(s: SparkSession, d: String,
      spread: Boolean = false): DataFrame = {
    val base = if (spread) Catalog.documentsSpread(s, d)
      else Catalog.documents(s, d)
    val docs = base.select(col("doc_id"), col("text"))
    docs.unionAll(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft near dup tail")).as("text")))
  }

  private[queries] val docsNearSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text || ' graft near dup tail' AS text
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  // ---- generated SQL fragments mirroring graft.ops.Dedup ----

  /** word 3-gram shingles of `corpus` (mirrors Dedup.shingles(_, 3)). */
  private def shinglesSql(corpus: String): String =
    s"""corpus AS ($corpus),
       |shingles AS (
       |  SELECT t.doc_id, u.shingle
       |  FROM (SELECT doc_id,
       |          list_transform(generate_series(1, len(toks) - 2),
       |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs
       |        FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
       |              FROM corpus)) t,
       |       unnest(t.shs) u(shingle))""".stripMargin

  private def ringHashSql(c: String): String =
    s"CAST(('0x' || substr(md5($c), 1, 15)) AS BIGINT) % $P"

  /** normalized-text fragment mirroring TextAnalysis.normalizeText. */
  private val normDocSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))"""

  private val sigColsSql = minhashParams.zipWithIndex.map {
    case ((a, c), k) => s"min((h * $a + $c) % $P) AS mh$k"
  }.mkString(",\n    ")

  /** Hot-shingle document-frequency cap shared by q19/q21 (mirrors
    * `Dedup.capHashed`): no shingle may index more than this many
    * docs before the candidate self-join. High enough to be a no-op on
    * the synthetic corpora; the skew guard is proven by DedupSpec. */
  val shingleMaxDf = 100L

  /** DF-cap CTE: `from` = a (doc_id, h) hashed-shingle relation name;
    * emits `capped` with hot shingle hashes removed. */
  private def capSql(from: String): String =
    s"""hotsh AS (SELECT h FROM (
       |  SELECT h, count(DISTINCT doc_id) AS df FROM $from GROUP BY 1)
       |  WHERE df > $shingleMaxDf),
       |capped AS (SELECT s.doc_id, s.h FROM $from s
       |           WHERE s.h NOT IN (SELECT h FROM hotsh))""".stripMargin

  // single-line SELECTs: this fragment passes through the enclosing
  // query's stripMargin too, which would eat a leading `||` continuation
  private val bandsSql = (0 until bandsOf).map { j =>
    s"SELECT doc_id, CAST(('0x' || substr(md5('${j}_' || " +
      s"CAST(mh${2 * j} AS VARCHAR) || '_' || " +
      s"CAST(mh${2 * j + 1} AS VARCHAR)), 1, 15)) AS BIGINT) AS bh FROM sigs"
  }.mkString("\nUNION ALL\n")

  /** Full UNCAPPED CTE chain (shingles → hashed → sigs → bands)
    * mirroring [[graft.streaming.StreamingDedup.bandHits]], which
    * computes signatures array-side with no document-frequency cap —
    * the oracle for the streaming dedup query (q201). */
  private[queries] def uncappedBandsSql(corpus: String): String =
    s"""${shinglesSql(corpus)},
       |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
       |sigs AS (SELECT doc_id,
       |    $sigColsSql
       |  FROM hashed0 GROUP BY doc_id),
       |bands AS ($bandsSql)""".stripMargin

  /** q18 — exact dedup groups by content fingerprint (argmin-groupBy). */
  val q18 = Q("q18_dedup_exact",
    (s, d) => Dedup.exactGroups(docsExact(s, d)),
    Some(
      s"""WITH corpus AS ($docsExactSql)
         |SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
         |         '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp,
         |       min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM corpus GROUP BY 1""".stripMargin))

  /** q19 — MinHash+LSH candidate pairs (shingle → 8-sig → 4 bands →
    * bucket join). Keeps the PLAIN scan like q78: the same-box r18
    * A/B read spread 2.22 s (1.9 s GC, 10 MB shuffle) vs plain 1.45 s
    * (0.3 s GC, 1 MB) — the extra exchange of the near-dup union costs
    * more than the rebalance buys this pipeline, whose band join
    * already re-shuffles everything it needs. */
  val q19 = Q("q19_dedup_minhash_lsh",
    (s, d) => Dedup.minhashCandidates(docsNear(s, d), 3,
      shingleMaxDf),
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
         |${capSql("hashed0")},
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.bh = b.bh AND a.doc_id < b.doc_id""".stripMargin))

  /** q20 — 32-bit SimHash fingerprints. */
  val q20 = {
    val sumCols = (0 until simhashBits).map(b =>
      s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val fpTerms = (0 until simhashBits).map(b =>
      s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    Q("q20_dedup_simhash",
      (s, d) => Dedup.simhash(
        Catalog.documents(s, d).select(col("doc_id"), col("text"))),
      Some(
        s"""WITH tok AS (
           |  SELECT t.doc_id, u.token
           |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
           |        FROM documents) t, unnest(t.toks) u(token)),
           |hashed AS (SELECT doc_id, ${ringHashSql("token")} AS h FROM tok),
           |sums AS (SELECT doc_id,
           |    $sumCols
           |  FROM hashed GROUP BY doc_id)
           |SELECT doc_id, $fpTerms AS simhash32 FROM sums""".stripMargin))
  }

  /** q21 — n-gram Jaccard pairs over the shingle inverted index. */
  val q21 = Q("q21_dedup_ngram_jaccard",
    (s, d) => Dedup.jaccardPairs(docsNear(s, d), 3, 0.2, shingleMaxDf),
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |sh_raw AS (SELECT DISTINCT doc_id, ${ringHashSql("shingle")} AS h
         |           FROM shingles),
         |${capSql("sh_raw")},
         |sh AS (SELECT doc_id, h FROM capped),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.h = b.h
         |            AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter,
         |       CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
         |FROM (SELECT p.*, sa.n_sh AS na, sb.n_sh AS nb
         |      FROM pairs p
         |      JOIN sizes sa ON sa.doc_id = p.doc_a
         |      JOIN sizes sb ON sb.doc_id = p.doc_b)
         |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.2""".stripMargin))

  /** q22 — embedding-cosine near-dup pairs, blocked by label (the
    * exact-integer cosine makes the threshold engine-portable). */
  val q22 = Q("q22_dedup_embedding_cosine",
    (s, d) => {
      val e = Catalog.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val corpus = e.unionAll(e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
          col("embedding")))
      // the native fused expression (graft.functions.CosineScaled) does
      // scale+dot+norms in one primitive loop per pair — the O(pairs·dim)
      // hot path this expression exists for; q36 proves it oracle-equal
      val a = corpus.as("a"); val b = corpus.as("b")
      a.join(b, col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          graft.functions.CosineScaled(col("a.embedding"), col("b.embedding"))
            .as("cosine"))
        .filter(col("cosine") >= 0.99)
    },
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, label, embedding FROM embeddings
         |  WHERE vec_id % 5 = 0),
         |iv AS (SELECT vec_id, label,
         |         list_transform(embedding,
         |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS iv
         |       FROM e),
         |n AS (SELECT *, CAST(list_aggregate(list_transform(iv, x -> x * x),
         |        'sum') AS DOUBLE) AS nrm FROM iv)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    CAST(list_aggregate(list_transform(generate_series(1, 64),
         |      i -> a.iv[i] * b.iv[i]), 'sum') AS DOUBLE) / sqrt(a.nrm * b.nrm)
         |      AS cosine
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cosine >= 0.99""".stripMargin))

  /** q61 — near-dup CLUSTER RESOLUTION: connected components over the
    * q19 LSH candidate pairs (min-label propagation,
    * [[Dedup.connectedComponents]]), emitting every doc with its
    * component representative (= min doc_id — the canonical survivor;
    * singletons are their own rep). The oracle computes true
    * reachability with a recursive CTE, so hash-green proves the
    * iterative propagation converged to the exact transitive closure.
    * `pairs` is MATERIALIZED: without the hint DuckDB re-evaluates the
    * whole LSH pipeline above it once per recursion step (~8× cost at
    * sf0.1 for a depth-5 closure). */
  val q61 = Q("q61_dedup_components",
    (s, d) => {
      val docs = docsNear(s, d)
      val pairs = Dedup.minhashCandidates(docs, 3, shingleMaxDf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
    },
    Some(
      s"""WITH RECURSIVE ${shinglesSql(docsNearSql)},
         |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
         |${capSql("hashed0")},
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql),
         |pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM bands a JOIN bands b
         |            ON a.bh = b.bh AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b)
         |SELECT v AS doc_id, min(r) AS rep FROM reach GROUP BY 1""".stripMargin))

  /** q78 — PREFIX-FILTERED all-pairs similarity join ([[Dedup
    * .jaccardPrefixPairs]], the AllPairs/PPJoin family) at t = 0.7.
    * The oracle is the PLAIN inverted-index Jaccard at the same
    * threshold — hash-green proves the prefix + length filters are
    * lossless (identical pairs, intersections, and scores) while the
    * Spark plan only ever self-joins ~30% of each doc's shingles. */
  val q78 = Q("q78_jaccard_prefix",
    (s, d) => Dedup.jaccardPrefixPairs(docsNear(s, d), 3, 0.7),
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |sh AS (SELECT DISTINCT doc_id, ${ringHashSql("shingle")} AS h
         |       FROM shingles),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.h = b.h
         |            AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter,
         |       CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
         |FROM (SELECT p.*, sa.n_sh AS na, sb.n_sh AS nb
         |      FROM pairs p
         |      JOIN sizes sa ON sa.doc_id = p.doc_a
         |      JOIN sizes sb ON sb.doc_id = p.doc_b)
         |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.7""".stripMargin))

  /** q63 — cross-doc PARAGRAPH dedup (the CCNet/common-crawl line-dedup
    * pass): explode docs into ¶-separated segments, drop every segment
    * whose distinct-document frequency exceeds 1 (boilerplate), and
    * reassemble the survivors in original order. The corpus injects two
    * boilerplate footers into every doc (same injection in the oracle)
    * so the drop path is exercised deterministically.
    *
    * Scale shape: segment DF is one groupBy on the segment (hash it to
    * bigint at 100 TB — here the string key keeps the oracle simple);
    * reassembly is one groupBy(doc_id) with an order-restoring
    * sort_array over (pos, seg) structs — no windows, no collects. */
  val q63 = Q("q63_dedup_paragraphs",
    (s, d) => {
      val corpus = Catalog.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit("¶graft footer alpha¶graft footer beta"))
          .as("text"))
      val segs = corpus
        .select(col("doc_id"), posexplode(split(col("text"), "¶")))
        .select(col("doc_id"), col("pos"), col("col").as("seg"))
      val dfreq = segs.groupBy(col("seg"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val kept = segs.join(dfreq, "seg").filter(col("df") <= 1)
      val totals = segs.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"))
      val clean = kept.groupBy(col("doc_id")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")), "¶").as("clean_text"),
        count(lit(1)).as("n_kept"))
      totals.join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
    },
    Some(
      """WITH corpus AS (
        |  SELECT doc_id,
        |    text || '¶graft footer alpha¶graft footer beta' AS text
        |  FROM documents),
        |t AS (SELECT doc_id, regexp_split_to_array(text, '¶') AS parts
        |      FROM corpus),
        |segs AS (SELECT doc_id, p AS pos, parts[p] AS seg
        |         FROM (SELECT doc_id, parts,
        |                 unnest(generate_series(1, len(parts))) AS p
        |               FROM t)),
        |dfreq AS (SELECT seg, count(DISTINCT doc_id) AS df
        |          FROM segs GROUP BY 1),
        |kept AS (SELECT s.* FROM segs s JOIN dfreq USING (seg)
        |         WHERE df <= 1),
        |totals AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY 1),
        |clean AS (SELECT doc_id,
        |            string_agg(seg, '¶' ORDER BY pos) AS clean_text,
        |            count(*) AS n_kept
        |          FROM kept GROUP BY 1)
        |SELECT t.doc_id,
        |  coalesce(c.clean_text, '') AS clean_text,
        |  coalesce(c.n_kept, 0) AS n_kept,
        |  t.n_segs - coalesce(c.n_kept, 0) AS n_dropped
        |FROM totals t LEFT JOIN clean c USING (doc_id)""".stripMargin))

  /** q67 — benchmark DECONTAMINATION: remove every training doc whose
    * normalized content fingerprint matches a held-out eval set (every
    * 50th doc stands in for the benchmark; the corpus also injects
    * shifted-id verbatim copies of those docs, which must be caught
    * too — fingerprint matching is id-blind by construction). The
    * anti-join is the operator: eval sets are tiny, so it plans as a
    * broadcast anti-join — map-side, no shuffle of the corpus. */
  val q67 = Q("q67_decontaminate",
    (s, d) => {
      val docs = Catalog.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionAll(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.ops.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select(graft.ops.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      corpus.join(broadcast(bench), Seq("fp"), "left_anti")
        .select(col("doc_id"))
    },
    Some(
      s"""WITH corpus AS (
         |  SELECT doc_id, md5($normDocSql) AS fp FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, md5($normDocSql) FROM documents
         |  WHERE doc_id % 50 = 0),
         |bench AS (SELECT md5($normDocSql) AS fp FROM documents
         |          WHERE doc_id % 50 = 0)
         |SELECT doc_id FROM corpus
         |WHERE fp NOT IN (SELECT fp FROM bench)""".stripMargin))

  /** q96 — INCREMENTAL DEDUP-INDEX MAINTENANCE: the daily-crawl shape.
    * A persisted MinHash signature index covers the existing corpus
    * (step 1 simulates that history — in production it already sits in
    * storage); the incremental run then shingles/hashes ONLY the delta
    * batch, reads the index back, and band-joins delta×all — never
    * all×all, so each day's near-dup cost is O(delta · corpus/buckets)
    * instead of re-LSHing the whole corpus. Emits the canonicalized
    * candidate pairs touching the delta; the oracle recomputes the FULL
    * pair set declaratively and filters to delta-touching pairs —
    * hash-green proves the incremental path finds exactly the pairs a
    * full rebuild would. (Uncapped variant; the DF-cap composes as in
    * q19.)
    *
    * The history index is the protocol's PRE-EXISTING state ("in
    * production it already sits in storage") — materialized once per
    * documents generation via [[graft.ops.Fixtures.ensure]], stamped by
    * source content + minhash params, so the timed query is exactly
    * the incremental path: sign the delta, read the index, band-join
    * (FixturesSpec pins that the second run writes nothing). */
  val q96 = {
    val deltaFrom = 450L
    Q("q96_incremental_dedup_index",
      (s, d) => {
        val idxPath = s"${graft.ops.Fixtures.root(s)}/dedup_index_" +
          graft.ops.Fixtures.pathKey(d)
        val corpus = docsNear(s, d)
        val isDelta = (col("doc_id") % 1000000L) >= deltaFrom
        // 1. history: the signature index previous runs left behind —
        // build-once per (documents generation, minhash params)
        val stamp =
          graft.ops.Fixtures.datasetStamp(s, s"$d/documents.parquet") +
            s"|mh=${graft.ops.Fixtures.contentHash(
              Dedup.minhashParams.mkString(","))}" +
            s"|delta=$deltaFrom|algo=${Dedup.algoVersion}|fmt=1"
        graft.ops.Fixtures.ensure(s, idxPath, stamp) { stg =>
          Dedup.minhashSignature(
              Dedup.hashedShingles(corpus.filter(!isDelta), 3))
            .write.mode("overwrite").parquet(stg)
        }
        // 2. the incremental run: sign the delta only, join the index.
        // Delta signing stays EXPLODED (r19 A/B): the array-side form
        // (see q194) was tried and reverted — q96 has no DF-cap pass,
        // so the exploded pipeline pays only ONE corpus-shaped shuffle
        // here, and the band self-join downstream dominates; the
        // interpreted higher-order transforms tripled summed task time
        // (DriverFloorProbe 1.02 → 3.53 s) for a shuffle that is cheap
        // at this shape, and the bench window read +0.3 s. q194, which
        // also drops the cap's countDistinct aggregation, is where the
        // swap pays.
        val baseSigs = s.read.parquet(idxPath)
        val deltaSigs = Dedup.minhashSignature(
            Dedup.hashedShingles(corpus.filter(isDelta), 3))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val allBands = Dedup.lshBands(baseSigs.unionByName(deltaSigs))
        val deltaBands = Dedup.lshBands(deltaSigs)
        deltaBands.as("a").join(allBands.as("b"),
            col("a.bh") === col("b.bh") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(lit(1)).select(col("doc_a"), col("doc_b"))
      },
      Some(
        s"""WITH ${shinglesSql(docsNearSql)},
           |hashed AS (SELECT doc_id, ${ringHashSql("shingle")} AS h
           |           FROM shingles),
           |sigs AS (SELECT doc_id,
           |    $sigColsSql
           |  FROM hashed GROUP BY doc_id),
           |bands AS ($bandsSql),
           |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |          FROM bands a JOIN bands b
           |            ON a.bh = b.bh AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b FROM pairs
           |WHERE doc_a % 1000000 >= $deltaFrom
           |   OR doc_b % 1000000 >= $deltaFrom""".stripMargin))
  }

  /** q110 — N-GRAM DECONTAMINATION (the GPT-3-style sibling of q67's
    * whole-document fingerprint anti-join): a document is contaminated
    * if more than half its distinct token 13-grams appear in the
    * benchmark set — which catches PARTIAL verbatim inclusion (a
    * benchmark question pasted mid-document) that whole-doc hashing
    * misses. The benchmark here is every 40th doc with its first 5
    * tokens dropped, so flagged docs overlap high-but-below-1.0 —
    * exercising the threshold, not just exact self-match. Shapes: grams
    * are hashed to bigints before the join (the shuffle carries 8-byte
    * keys, not 100-byte strings); the benchmark gram set is
    * dimension-sized → broadcast semi join; per-doc fractions are exact
    * int ratios. */
  val q110 = {
    val n = 13
    val dropPrefix = 5
    val gramExpr = // 13-token sliding windows, [] when the doc is shorter
      s"""CASE WHEN size(toks) >= $n
         |  THEN transform(sequence(1, size(toks) - ${n - 1}),
         |    i -> array_join(slice(toks, i, $n), ' '))
         |  ELSE slice(toks, 1, 0) END""".stripMargin // typed empty array
    Q("q110_ngram_decontaminate",
      (s, d) => {
        val docs = Catalog.documents(s, d)
          .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text"))
            .as("toks"))
        val grams = docs
          .select(col("doc_id"), explode(expr(gramExpr)).as("g"))
          .select(col("doc_id"), graft.functions.Hash60(col("g")).as("gh"))
          .distinct()
        val bench = docs.filter(col("doc_id") % 40 === 0)
          .select(slice(col("toks"), lit(dropPrefix + 1),
            greatest(size(col("toks")) - dropPrefix, lit(0))).as("toks"))
          .select(explode(expr(gramExpr)).as("g"))
          .select(graft.functions.Hash60(col("g")).as("gh"))
          .distinct()
        val hits = grams.join(broadcast(bench), Seq("gh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
        grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("contaminated",
            col("n_hit") * 2L > col("n_grams")) // frac > 0.5, exact ints
      },
      Some {
        def gramsSql(toks: String) =
          s"""list_transform(generate_series(1, len($toks) - ${n - 1}),
             |  i -> array_to_string(($toks)[i : i + ${n - 1}], ' '))""".stripMargin
        val tokSql = """regexp_split_to_array(text, '\s+')"""
        s"""WITH d AS (SELECT doc_id, $tokSql AS toks FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id,
           |    ${TextQueries.hash60Sql("u.g")} AS gh
           |  FROM d, unnest(${gramsSql("d.toks")}) AS u(g)),
           |bench AS (
           |  SELECT DISTINCT ${TextQueries.hash60Sql("u.g")} AS gh
           |  FROM (SELECT toks[${dropPrefix + 1} : len(toks)] AS toks
           |        FROM d WHERE doc_id % 40 = 0) b,
           |       unnest(${gramsSql("b.toks")}) AS u(g)),
           |hits AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
           |  FROM grams WHERE gh IN (SELECT gh FROM bench) GROUP BY 1),
           |tot AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           |  FROM grams GROUP BY 1)
           |SELECT doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
           |  COALESCE(n_hit, 0) * 2 > n_grams AS contaminated
           |FROM tot LEFT JOIN hits USING (doc_id)""".stripMargin
      })
  }

  /** q194 — LSH COLLISION HISTOGRAM / DUPLICATE-RATE ESTIMATE: the
    * bucket-size distribution of the MinHash band index (q19's exact
    * signature pipeline), WITHOUT running the candidate pair join —
    * Σ_buckets C(size,2) per size estimates the near-dup pair volume a
    * full LSH pass would generate. The production use: size the dedup
    * job (and catch a degenerate corpus that would explode the bucket
    * join) from one aggregation pass before paying for it.
    *
    * Scale shape: one groupBy on the band-hash (corpus×4 rows, map-side
    * combine) then a bucket-size histogram (grid-sized). No self-join
    * anywhere — that's the point.
    */
  val q194 = Q("q194_lsh_collision_stats",
    (s, d) => {
      // plain scan (r19): the r18 spread regressed in the driver window
      // (1.44 → 1.69) and the same-box isolated A/B read flat-to-worse
      // (spread min 1.67 / median 1.99 vs plain min 1.75 / median 1.84
      // over 5 fresh-JVM runs) — the band groupBy re-shuffles everything
      // anyway, so the up-front exchange is pure cost (q19's shape)
      //
      // signatures derived ARRAY-SIDE (r19): the exploded
      // hashedShingles → minhashSignature form pushed the corpus's
      // whole (doc_id, h) relation (~40× the input bytes) through a
      // grouped-min shuffle that exists only to fold per-doc minima —
      // the exact shape the round-13 stress replaced in
      // minhashCandidates. signatureFromArrays folds the same minima
      // in-row (bit-identical values, minhash being multiset-
      // invariant; capArrays drops the same hot hashes as capHashed),
      // so the only corpus-shaped exchange left is the band groupBy
      // itself. The per-doc array is persisted for the same reason as
      // in minhashCandidates: the DF pre-pass and the 8 signature
      // columns otherwise each re-derive tokenize→shingle→hash.
      val arrs = Dedup.capArrays(
        Dedup.hashedShingleArrays(docsNear(s, d), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        shingleMaxDf)
      val bands = Dedup.lshBands(Dedup.signatureFromArrays(arrs))
      bands.groupBy(col("bh")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .groupBy(col("c")).agg(count(lit(1)).as("n_buckets"))
        .select(col("c").cast("bigint").as("bucket_size"),
          col("n_buckets").cast("bigint").as("n_buckets"),
          (col("n_buckets") * expr("(c * (c - 1)) div 2")).cast("bigint")
            .as("cand_pairs"))
    },
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
         |${capSql("hashed0")},
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql),
         |bsz AS (SELECT bh, count(*) AS c FROM bands GROUP BY 1)
         |SELECT CAST(c AS BIGINT) AS bucket_size,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(count(*) * ((c * (c - 1)) // 2) AS BIGINT) AS cand_pairs
         |FROM bsz WHERE c >= 2 GROUP BY c""".stripMargin))

  /** q195 — TEMPLATE-FINGERPRINT DEDUP (synthetic/boilerplate data
    * dedup): cluster documents whose text is identical AFTER masking
    * every digit run — catches "the same generated template filled with
    * different numbers", which exact dedup (q18) misses and near-dup
    * may only partially group. Fingerprint = md5 of (lowercase, digit
    * runs → '#', whitespace collapsed). The corpus injects two
    * numbered variants per 7th doc; the injection lives in both engines
    * and defines the contract.
    *
    * Scale shape: identical to exact dedup — map-side fingerprints, one
    * groupBy with combinable aggregates.
    */
  val q195 = Q("q195_template_dedup",
    (s, d) => {
      val docs = Catalog.documents(s, d).select(col("doc_id"), col("text"))
      def variant(off: Long, mult: Int) = docs
        .filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + off).as("doc_id"),
          concat(col("text"), lit(" v "),
            (col("doc_id") * mult).cast("string")).as("text"))
      val corpus = docs.unionAll(variant(2000000L, 7))
        .unionAll(variant(3000000L, 13))
      val tpl = trim(regexp_replace(regexp_replace(lower(col("text")),
        "[0-9]+", "#"), "\\s+", " "))
      corpus.select(col("doc_id"), md5(tpl.cast("binary")).as("tpl_fp"),
          md5(col("text").cast("binary")).as("txt_fp"))
        .groupBy(col("tpl_fp")).agg(
          min(col("doc_id")).as("keep_id"),
          count(lit(1)).cast("bigint").as("n_members"),
          countDistinct(col("txt_fp")).cast("bigint").as("n_distinct_texts"))
    },
    Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         text || ' v ' || CAST(doc_id * 7 AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |         text || ' v ' || CAST(doc_id * 13 AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |         '[0-9]+', '#', 'g'), '\s+', ' ', 'g'))) AS tpl_fp,
        |  min(doc_id) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
        |FROM corpus GROUP BY 1""".stripMargin))

  /** q196 — N-GRAM NOVELTY SCORE: per document, the fraction of its
    * distinct 3-shingles that appear in NO other document — high
    * novelty = unique content worth keeping, low novelty = boilerplate
    * assembled from corpus-common phrases. The complement of the
    * decontamination/dedup family: instead of dropping overlap, score
    * it. novel_ppm is an exact integer ratio (integer division — no FP).
    *
    * Scale shape: one distinct over hashed shingles, one
    * vocabulary-sized document-frequency groupBy, one join back
    * (broadcastable at bounded vocabulary), one per-doc groupBy — all
    * map-side-combinable counts.
    */
  val q196 = Q("q196_ngram_novelty",
    (s, d) => {
      // plain scan (r19): the r18 spread regressed in the driver window
      // (0.86 → 1.22) and the isolated A/B reads plain faster too (0.99
      // vs 1.05 min-of-5) — the distinct() right above re-shuffles by
      // (doc_id, h) anyway, so the round-robin exchange buys nothing
      val sh = Dedup.hashedShingles(
        Catalog.documents(s, d).select(col("doc_id"), col("text")), 3)
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      sh.join(df, Seq("h"))
        .groupBy(col("doc_id")).agg(
          count(lit(1)).cast("bigint").as("n_sh"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).cast("bigint")
            .as("n_novel"))
        .withColumn("novel_ppm",
          expr("(n_novel * 1000000) div n_sh").cast("bigint"))
    },
    Some(
      s"""WITH ${shinglesSql("SELECT doc_id, text FROM documents")},
         |sh AS (SELECT DISTINCT doc_id, ${ringHashSql("shingle")} AS h
         |       FROM shingles),
         |dfr AS (SELECT h, count(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST((sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) AS novel_ppm
         |FROM sh JOIN dfr USING (h) GROUP BY doc_id""".stripMargin))

  /** q198 — SEMANTIC DECONTAMINATION: the embedding-space sibling of
    * q67 (exact fingerprint) and q110 (13-gram): flag every corpus
    * vector whose cosine against ANY held-out benchmark vector (every
    * 50th embedding stands in for the eval set) reaches 0.9 — catching
    * paraphrased/reformatted contamination that text matching misses.
    * The corpus injects verbatim copies of every 100th benchmark vector
    * under shifted ids (same injection in the oracle), which must be
    * caught at cosine ~1.
    *
    * Scale shape: the operator's contract is a BOUNDED external eval
    * set (benchmarks are thousands of rows no matter the corpus size —
    * the %50 sample here is only the fixture's deterministic stand-in
    * for that external table), so it plans as a broadcast nested-loop
    * over the corpus — ONE corpus scan, zero shuffles of corpus data,
    * embarrassingly parallel; the [[graft.functions.CosineScaled]]
    * fused expression (q22/q36's, proved bit-identical to the oracle's
    * integer-quantized arithmetic) does scale+dot+norm in one codegen'd
    * loop per pair. An UNbounded dedup-style comparison set is q22/q61's
    * territory (bucketed, never broadcast). */
  val q198 = Q("q198_semantic_decontaminate",
    (s, d) => {
      val e = Catalog.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val bench = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"))
      val corpus = e.unionAll(bench.filter(col("bench_id") % 100 === 0)
        .select((col("bench_id") + 200000L).as("vec_id"),
          col("bvec").as("embedding")))
      corpus.crossJoin(broadcast(bench))
        .select(col("vec_id"), col("bench_id"),
          graft.functions.CosineScaled(col("embedding"), col("bvec"))
            .as("cosine"))
        .filter(col("cosine") >= 0.9)
        .groupBy(col("vec_id")).agg(
          count(lit(1)).cast("bigint").as("n_bench_hits"),
          min(col("bench_id")).cast("bigint").as("first_bench_id"),
          max(col("cosine")).as("max_cosine"))
    },
    Some(
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |bench AS (SELECT vec_id AS bench_id, embedding AS bvec FROM e
        |          WHERE vec_id % 50 = 0),
        |corpus AS (SELECT vec_id, embedding FROM e
        |           UNION ALL
        |           SELECT bench_id + 200000, bvec FROM bench
        |           WHERE bench_id % 100 = 0),
        |iv AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS iv
        |       FROM corpus),
        |ivb AS (SELECT bench_id,
        |         list_transform(bvec,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS iv
        |       FROM bench),
        |n AS (SELECT *, CAST(list_aggregate(list_transform(iv, x -> x * x),
        |        'sum') AS DOUBLE) AS nrm FROM iv),
        |nb AS (SELECT *, CAST(list_aggregate(list_transform(iv, x -> x * x),
        |        'sum') AS DOUBLE) AS nrm FROM ivb),
        |pairs AS (
        |  SELECT c.vec_id, b.bench_id,
        |    CAST(list_aggregate(list_transform(generate_series(1, 64),
        |      i -> c.iv[i] * b.iv[i]), 'sum') AS DOUBLE)
        |      / sqrt(c.nrm * b.nrm) AS cosine
        |  FROM n c, nb b)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
        |  CAST(min(bench_id) AS BIGINT) AS first_bench_id,
        |  max(cosine) AS max_cosine
        |FROM pairs WHERE cosine >= 0.9 GROUP BY 1""".stripMargin))

  /** q199 — CORPUS-OVERLAP ESTIMATION (KMV/bottom-k MinHash sketch):
    * per-source bottom-256 sketches over hashed 3-shingles, then for
    * every source pair the KMV Jaccard estimate (fraction of the k
    * smallest union hashes present in both sketches) NEXT TO the exact
    * Jaccard from the full shingle sets — the "how much does crawl B
    * add over crawl A" question answered from kilobyte sketches before
    * paying for a full comparison. All outputs are exact integers
    * (ppm via integer division).
    *
    * Scale shape: the exact side is BITMAP co-occurrence — one
    * combinable bit_or per hash folds each hash's source set into a
    * ≤62-bit mask, masks collapse by equality into a handful of
    * (mask, count) rows, and only THAT tiny relation expands against
    * the pair list; inter(a,b) = Σ counts of masks with both bits.
    * Vocabulary-sized map-side work, pair-count-independent, and no
    * self-join at all (union = |A| + |B| − ∩ closes it). Two earlier
    * cuts are instructive: tagging every vocab row against every pair
    * (broadcast nested loop, vocab × 190 pairs) and the co-occurrence
    * SELF-JOIN on the hash (Σ_h C(s_h, 2) rows — ~9.5 M here, because
    * a synthetic vocabulary puts most shingles in ALL 20 sources) both
    * measured ~3 s; the mask fold is the shape that survives dense
    * co-occurrence. The sketch side collapses to |sources| rows —
    * bottom-k per source via the bounded-heap [[graft.plans
    * .TopKPerGroup]] operator (partial per-partition heaps, so a
    * source's full hash set is never gathered into one array) and a
    * ≤k-element collect — with every pair computation pure array
    * arithmetic on those rows. At 600 k rows the stage-count collapse
    * took the query 3.0 → 1.5 s (the shingle-pipeline floor); at
    * 100 TB it is the difference between a per-pair shuffle cascade
    * and one bounded combinable pass. */
  /** Dense 0-based source ids for q199's bitmap fold, guarded against
    * the 64-source cliff: the single-BIGINT co-occurrence mask holds at
    * most 62 safe bits (Spark's `shiftleft` wraps its shift amount mod
    * 64, so a 63rd source would silently alias a low bit and corrupt
    * every intersection with no error). Rather than wrong answers, the
    * fold fails loudly at execution time; wider source sets need
    * multi-word masks (the q135 `bitmap_construct_agg`-style machinery,
    * one BIGINT word per 62 sources). */
  private[graft] def maskSourceIds(sources: DataFrame): DataFrame =
    sources
      .withColumn("sid",
        row_number().over(Window.orderBy(col("source"))) - 1)
      .withColumn("sid", when(col("sid") < 62, col("sid"))
        .otherwise(raise_error(lit(
          "q199_corpus_overlap: more than 62 distinct sources would " +
            "overflow the single-BIGINT co-occurrence mask (shiftleft " +
            "wraps its shift amount mod 64 -> silent bit aliasing); " +
            "upgrade to multi-word masks (q135's bitmap machinery)"))))

  val q199 = {
    val k = 256
    Q("q199_corpus_overlap",
      (s, d) => {
        // shingle the corpus keyed directly by source (hashedShingles
        // is id-type-agnostic) — no join back to documents, one fewer
        // shuffle of the shingle-sized relation
        val sv = Dedup.hashedShingles(
            Catalog.documentsSpread(s, d)
              .select(col("source").as("doc_id"), col("text")), 3)
          .select(col("doc_id").as("source"), col("h")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the sketch side collapses to |sources| rows: bottom-k per
        // source via the BOUNDED-HEAP TopKPerGroup operator (partial
        // heaps per partition — never a source's full hash set in one
        // array, which a bare collect_list-then-slice would gather),
        // then a ≤k-element collect per source; every pair computation
        // below is array arithmetic on those rows.
        val sk = graft.plans.TopKPerGroup(sv, k,
          Seq(col("source")), Seq(col("h").asc))
        val sstats = sv.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .join(sk.groupBy(col("source"))
            .agg(array_sort(collect_list(col("h"))).as("ks")), "source")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sids = maskSourceIds(sstats.select(col("source")))
        val pe = sstats.select(col("source").as("src_a"), col("n").as("na"),
            col("ks").as("ka"))
          .crossJoin(sstats.select(col("source").as("src_b"),
            col("n").as("nb"), col("ks").as("kb")))
          .filter(col("src_a") < col("src_b"))
          .withColumn("uk",
            slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
          .select(col("src_a"), col("src_b"), col("na"), col("nb"),
            size(col("uk")).cast("bigint").as("k_eff"),
            size(filter(col("uk"), x =>
              array_contains(col("ka"), x) && array_contains(col("kb"), x)))
              .cast("bigint").as("inter_k"))
        // exact side: bitmap co-occurrence (source set per hash folded
        // into a mask, masks collapsed by equality) + size algebra;
        // union = |A| + |B| − ∩ (pair-count-independent, no self-join)
        val masks = sv.join(broadcast(sids), "source")
          .groupBy(col("h"))
          .agg(sum(expr("shiftleft(cast(1 as bigint), sid)")).as("mask"))
          .groupBy(col("mask")).agg(count(lit(1)).as("mc"))
        val pairIds = pe.select(col("src_a"), col("src_b"))
          .join(broadcast(sids).select(col("source").as("src_a"),
            col("sid").as("sid_a")), "src_a")
          .join(broadcast(sids).select(col("source").as("src_b"),
            col("sid").as("sid_b")), "src_b")
        val inter = masks.crossJoin(broadcast(pairIds))
          .filter(expr("shiftright(mask, sid_a) % 2 = 1") &&
            expr("shiftright(mask, sid_b) % 2 = 1"))
          .groupBy(col("src_a"), col("src_b")).agg(sum(col("mc")).as("io"))
        pe.join(inter, Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"), col("k_eff"),
            col("inter_k"),
            expr("(inter_k * 1000000) div greatest(k_eff, 1)").cast("bigint")
              .as("est_ppm"),
            coalesce(col("io"), lit(0L)).cast("bigint").as("inter_exact"),
            (col("na") + col("nb") - coalesce(col("io"), lit(0L)))
              .cast("bigint").as("union_exact"))
          .withColumn("exact_ppm",
            expr("(inter_exact * 1000000) div greatest(union_exact, 1)")
              .cast("bigint"))
      },
      Some(
        s"""WITH t AS (SELECT source, regexp_split_to_array(text, '\\s+') AS toks
           |           FROM documents),
           |shingles AS (
           |  SELECT t.source, u.shingle
           |  FROM (SELECT source,
           |          list_transform(generate_series(1, len(toks) - 2),
           |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shs
           |        FROM t) t,
           |       unnest(t.shs) u(shingle)),
           |sv AS MATERIALIZED (
           |  SELECT DISTINCT source, ${ringHashSql("shingle")} AS h
           |  FROM shingles),
           |sstats AS MATERIALIZED (
           |  SELECT source, count(*) AS n,
           |    (list_sort(list(h)))[1:$k] AS ks
           |  FROM sv GROUP BY 1),
           |sids AS (SELECT source, row_number() OVER (ORDER BY source) - 1
           |           AS sid FROM sstats),
           |pe AS (SELECT a.source AS src_a, b.source AS src_b,
           |         a.n AS na, b.n AS nb, a.ks AS ka, b.ks AS kb,
           |         list_sort(list_distinct(a.ks || b.ks))[1:$k] AS uk
           |       FROM sstats a JOIN sstats b ON a.source < b.source),
           |est AS (SELECT src_a, src_b, na, nb,
           |          CAST(len(uk) AS BIGINT) AS k_eff,
           |          CAST(len(list_filter(uk, x ->
           |            list_contains(ka, x) AND list_contains(kb, x)))
           |            AS BIGINT) AS inter_k
           |        FROM pe),
           |masks AS (SELECT mask, count(*) AS mc FROM (
           |            SELECT s.h, sum(CAST(1 AS BIGINT) << i.sid) AS mask
           |            FROM sv s JOIN sids i USING (source) GROUP BY s.h)
           |          GROUP BY 1),
           |pids AS (SELECT p.src_a, p.src_b, ia.sid AS sid_a, ib.sid AS sid_b
           |         FROM pe p
           |         JOIN sids ia ON ia.source = p.src_a
           |         JOIN sids ib ON ib.source = p.src_b),
           |io AS (SELECT q.src_a, q.src_b, sum(m.mc) AS io
           |       FROM masks m, pids q
           |       WHERE (m.mask >> q.sid_a) % 2 = 1
           |         AND (m.mask >> q.sid_b) % 2 = 1
           |       GROUP BY 1, 2)
           |SELECT e.src_a, e.src_b, e.k_eff, e.inter_k,
           |  CAST((e.inter_k * 1000000) // greatest(e.k_eff, 1) AS BIGINT)
           |    AS est_ppm,
           |  CAST(coalesce(i.io, 0) AS BIGINT) AS inter_exact,
           |  CAST(e.na + e.nb - coalesce(i.io, 0) AS BIGINT) AS union_exact,
           |  CAST((CAST(coalesce(i.io, 0) AS BIGINT) * 1000000)
           |    // greatest(e.na + e.nb - coalesce(i.io, 0), 1) AS BIGINT)
           |    AS exact_ppm
           |FROM est e LEFT JOIN io i
           |  ON i.src_a = e.src_a AND i.src_b = e.src_b""".stripMargin))
  }

  /** q200 — LEAKAGE-SAFE SPLIT: train/val/test assignment that is
    * atomic per NEAR-DUP CLUSTER (q61's exact connected components over
    * the LSH candidate pairs), so two near-duplicates can never land on
    * opposite sides of a split — the eval-leakage failure mode of
    * row-hash splitting (q46). The split of a cluster is a pure hash of
    * its representative (Knuth multiplicative, 80/10/10), deterministic
    * and shuffle-free once components exist; output is the per-split
    * summary (docs, clusters, largest cluster, multi-doc clusters).
    * Hash-green against the oracle's recursive-CTE closure + identical
    * integer hash proves both the exact clustering and the atomicity of
    * the assignment. */
  val q200 = Q("q200_leakage_safe_split",
    (s, d) => {
      val docs = docsNear(s, d)
      val pairs = Dedup.minhashCandidates(docs, 3, shingleMaxDf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cc = Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
      val assigned = cc
        .withColumn("bucket", (col("rep") * lit(2654435761L)) % 1000)
        .withColumn("split",
          when(col("bucket") < 800, "train")
            .when(col("bucket") < 900, "val").otherwise("test"))
      assigned.groupBy(col("split"), col("rep"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("split")).agg(
          sum(col("sz")).cast("bigint").as("n_docs"),
          count(lit(1)).cast("bigint").as("n_clusters"),
          max(col("sz")).cast("bigint").as("max_cluster_size"),
          sum(when(col("sz") > 1, 1L).otherwise(0L)).cast("bigint")
            .as("n_multi_clusters"))
    },
    Some(
      s"""WITH RECURSIVE ${shinglesSql(docsNearSql)},
         |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
         |${capSql("hashed0")},
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql),
         |pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM bands a JOIN bands b
         |            ON a.bh = b.bh AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
         |comp AS (SELECT v AS doc_id, min(r) AS rep FROM reach GROUP BY 1),
         |assigned AS (SELECT doc_id, rep,
         |    CASE WHEN (rep * 2654435761) % 1000 < 800 THEN 'train'
         |         WHEN (rep * 2654435761) % 1000 < 900 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM comp),
         |szs AS (SELECT split, rep, count(*) AS sz FROM assigned GROUP BY 1, 2)
         |SELECT split, CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(max(sz) AS BIGINT) AS max_cluster_size,
         |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_clusters
         |FROM szs GROUP BY 1""".stripMargin))

  /** q203 — DEDUP DETECTOR PRECISION/RECALL AUDIT: grade the LSH
    * candidate generator (q19's exact pipeline) against the KNOWN
    * ground truth — the injected near-dup pairs (d, d+10⁶) for every
    * 5th doc. One summary row: truth size, candidate count, hits, and
    * integer-ppm precision/recall. This is the accuracy dial every
    * production dedup deployment reads before trusting a parameter
    * change (bands × rows, shingle n, DF cap); it recomputes the full
    * candidate set to grade it, so like q150/q153/q171 it is
    * registered CORRECTNESS-ONLY ([[Q.benchExcluded]]) — audits run
    * when the dial turns, not per bench. */
  val q203 = Q("q203_dedup_recall_audit",
    (s, d) => {
      val truth = Catalog.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 1000000L).as("doc_b"))
      val cand = Dedup.minhashCandidates(docsNear(s, d), 3, shingleMaxDf)
      val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
      cand.agg(count(lit(1)).cast("bigint").as("n_cand"))
        .crossJoin(truth.agg(count(lit(1)).cast("bigint").as("n_truth")))
        .crossJoin(hit.agg(count(lit(1)).cast("bigint").as("n_hit")))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          expr("(n_hit * 1000000) div greatest(n_cand, 1)").cast("bigint")
            .as("precision_ppm"),
          expr("(n_hit * 1000000) div greatest(n_truth, 1)").cast("bigint")
            .as("recall_ppm"))
    },
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |hashed0 AS (SELECT doc_id, ${ringHashSql("shingle")} AS h FROM shingles),
         |${capSql("hashed0")},
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.bh = b.bh AND a.doc_id < b.doc_id),
         |truth AS (SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
         |          FROM documents WHERE doc_id % 5 = 0),
         |hit AS (SELECT c.* FROM cand c JOIN truth t
         |        ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         |  (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit,
         |  CAST(((SELECT count(*) FROM hit) * 1000000)
         |    // greatest((SELECT count(*) FROM cand), 1) AS BIGINT)
         |    AS precision_ppm,
         |  CAST(((SELECT count(*) FROM hit) * 1000000)
         |    // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
         |    AS recall_ppm""".stripMargin))

  /** q204 — LSH S-CURVE CALIBRATION: per Jaccard decile, the fraction
    * of true similar pairs (exact inverted-index Jaccard, q21's
    * machinery at threshold 0) that the banded MinHash index (q19)
    * actually catches, next to the ANALYTIC collision probability
    * 1 − (1 − s²)⁴ for the 8-sig × 4-band × 2-row layout — the curve
    * one reads before choosing bands × rows for a corpus. Deciles are
    * INTEGER ((inter·10) div union); the theory column averages the
    * per-pair closed form as fixed-shape multiplications (no pow(), so
    * both engines' FP is bit-identical), micro-rounded.
    *
    * Like q203 this recomputes full candidate and truth sets to grade
    * them → CORRECTNESS-ONLY ([[Q.benchExcluded]]). */
  val q204 = Q("q204_lsh_scurve_calibration",
    (s, d) => {
      val docs = docsNear(s, d)
      val hs = Dedup.hashedShingles(docs, 3).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = Dedup.capHashed(hs, shingleMaxDf)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val pairs = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"),
          col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"),
          col("n_sh").as("nb")), "doc_b")
        .withColumn("un", col("na") + col("nb") - col("inter"))
      val cand = Dedup.minhashCandidates(docs, 3, shingleMaxDf)
        .withColumn("caught", lit(1L))
      pairs.join(cand, Seq("doc_a", "doc_b"), "left")
        .withColumn("j", col("inter").cast("double") / col("un").cast("double"))
        .withColumn("q1", lit(1.0) - col("j") * col("j"))
        .withColumn("p_theory",
          lit(1.0) - col("q1") * col("q1") * col("q1") * col("q1"))
        .groupBy(expr("(inter * 10) div un").cast("bigint").as("decile"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          sum(coalesce(col("caught"), lit(0L))).cast("bigint").as("n_caught"),
          round(avg(col("p_theory")) * 1e6).cast("bigint").as("theory_ppm"))
        .withColumn("caught_ppm",
          expr("(n_caught * 1000000) div n_pairs").cast("bigint"))
    },
    Some(
      s"""WITH ${shinglesSql(docsNearSql)},
         |sh_raw AS (SELECT DISTINCT doc_id, ${ringHashSql("shingle")} AS h
         |           FROM shingles),
         |${capSql("sh_raw")},
         |sh AS (SELECT doc_id, h FROM capped),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         count(*) AS inter
         |       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |pairs AS (SELECT p.doc_a, p.doc_b, p.inter,
         |            sa.n_sh + sb.n_sh - p.inter AS un
         |          FROM ip p
         |          JOIN sizes sa ON sa.doc_id = p.doc_a
         |          JOIN sizes sb ON sb.doc_id = p.doc_b),
         |sigs AS (SELECT doc_id,
         |    $sigColsSql
         |  FROM capped GROUP BY doc_id),
         |bands AS ($bandsSql),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.bh = b.bh AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT p.*,
         |    CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS caught,
         |    CAST(p.inter AS DOUBLE) / CAST(p.un AS DOUBLE) AS j
         |  FROM pairs p LEFT JOIN cand c
         |    ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b),
         |ds AS (SELECT (inter * 10) // un AS decile,
         |         count(*) AS n_pairs, sum(caught) AS n_caught,
         |         round(avg(1.0 - (1.0 - j * j) * (1.0 - j * j)
         |           * (1.0 - j * j) * (1.0 - j * j)) * 1000000) AS tp
         |       FROM scored GROUP BY 1)
         |SELECT CAST(decile AS BIGINT) AS decile,
         |  CAST(n_pairs AS BIGINT) AS n_pairs,
         |  CAST(n_caught AS BIGINT) AS n_caught,
         |  CAST(tp AS BIGINT) AS theory_ppm,
         |  CAST((n_caught * 1000000) // n_pairs AS BIGINT) AS caught_ppm
         |FROM ds""".stripMargin))

  val all: Seq[Q] = Seq(q18, q19, q20, q21, q22, q61, q63, q67, q78, q96,
    q110, q194, q195, q196, q198, q199, q200, q203, q204)
}
