package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → signature → band → bucket
  * join), SimHash bit-sum fingerprints, and n-gram Jaccard — the
  * standard near-dup stack (Broder '97 resemblance / Charikar '02
  * simhash lineage; see PAPERS.md).
  *
  * Everything is hash-portable: token/shingle hashes go through the
  * md5-derived [[TextAnalysis.hash60]] and modular arithmetic over a
  * 31-bit prime, so the DuckDB oracles reproduce signatures bit-for-bit.
  *
  * Scale shape (100 TB): shingling/hashing is map-side; the signature
  * aggregation is one shuffle on doc_id (partial min per mapper);
  * the LSH bucket join shuffles only (band, hash) keys — its whole
  * point is that bucket cardinality ≈ corpus size, never corpus², and
  * skewed buckets (boilerplate shingles) are handled by AQE skew-join.
  */
object Dedup {

  /** Version of the shingle/minhash/band ALGORITHM, for inclusion in
    * fixture stamps ([[Fixtures.ensure]]): a stamp covers source data
    * and declared params, but not the builder's logic — bump this
    * whenever [[hashedShingles]]/[[minhashSignature]]/[[lshBands]]
    * change, or stale stores would silently replay the old algorithm. */
  val algoVersion = 1

  /** 31-bit Mersenne prime for signature arithmetic: products
    * a·h stay < 2^38, far from 64-bit overflow in either engine. */
  val P: Long = 2147483647L

  /** (a, c) per minhash function h_k(x) = (a·x + c) mod P. */
  val minhashParams: Seq[(Long, Long)] =
    Seq((3L, 1L), (5L, 7L), (7L, 13L), (11L, 19L), (13L, 29L), (17L, 37L),
      (19L, 43L), (23L, 53L))

  val bandsOf: Int = 4 // 4 bands × 2 rows over the 8-signature

  val simhashBits: Int = 32

  /** Word n-gram shingles as one exploded (doc_id, shingle) relation.
    * Documents shorter than n tokens produce no shingles (both engines).
    * The token split is STAGED into its own projection so the shingle
    * lambda reads a bound array column — inlined, the regexp split would
    * re-run once per shingle (O(tokens²) per doc) in the interpreted
    * higher-order-function path. */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val tokenized = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val idx = when(size(col("toks")) >= n,
      sequence(lit(1), size(col("toks")) - (n - 1))).otherwise(array())
    tokenized.select(col("doc_id"),
      explode(transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*)))
        .as("shingle"))
  }

  /** shingle → position on the hash ring: hash60 mod P. */
  def ringHash(c: Column): Column = TextAnalysis.hash60(c) % P

  /** (doc_id, h) hashed-shingle relation: every downstream dedup
    * operator works over the 2×bigint form, never the shingle string —
    * the inverted-index self-join and the signature aggregation then
    * shuffle 16-byte rows instead of multi-word strings, and the md5 is
    * computed exactly once per shingle occurrence. */
  def hashedShingles(docs: DataFrame, n: Int): DataFrame =
    shingles(docs, n).select(col("doc_id"), ringHash(col("shingle")).as("h"))

  /** (doc_id, hs: array<bigint>) — each document's DISTINCT
    * hashed-shingle SET as one in-row array, computed entirely
    * MAP-SIDE (tokenize → shingle → hash → array_distinct, one
    * projection, zero shuffles). This is the representation the
    * 1000×-scale stress forced: the exploded [[hashedShingles]] form
    * is ~40× the input bytes, and pushing it through a per-doc
    * aggregation (signatures) or a corpus-wide distinct made those
    * shuffles the dominant transient footprint (~70 GB of spill at 5M
    * docs — PERF.md round 13). In array form the per-doc set NEVER
    * shuffles: signatures fold in-row ([[signatureFromArrays]]),
    * set sizes are `size(hs)`, and only genuinely corpus-wide steps
    * (document frequency, the candidate join) explode — each with
    * map-side partial aggregation. Same (doc, h) set as
    * `hashedShingles(docs, n).distinct()`, bit-identical hashes. */
  def hashedShingleArrays(docs: DataFrame, n: Int): DataFrame = {
    val tokenized = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val idx = when(size(col("toks")) >= n,
      sequence(lit(1), size(col("toks")) - (n - 1))).otherwise(array())
    val shingled = tokenized.select(col("doc_id"),
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*))
        .as("shingles"))
    shingled.select(col("doc_id"),
      array_distinct(transform(col("shingles"),
        s => TextAnalysis.hash60(s) % P)).as("hs"))
  }

  /** DF-cap on the array representation (same semantics as
    * [[capHashed]]): drop every hash whose document frequency exceeds
    * `maxDf` from each document's set. The DF pass explodes with
    * map-side partial counts (per-doc sets are already distinct, so
    * `count(*)` ≡ `count(DISTINCT doc_id)`); the hot list is tiny by
    * construction, so it rides a 1-row broadcast and the cap itself is
    * a map-side array filter — the corpus never shuffles. */
  def capArrays(arrs: DataFrame, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) arrs
    else {
      val hot = arrs.select(explode(col("hs")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf)
        .agg(collect_list(col("h")).as("hot")) // empty list when no hot hashes
      arrs.crossJoin(broadcast(hot))
        .select(col("doc_id"),
          filter(col("hs"), h => !array_contains(col("hot"), h)).as("hs"))
    }

  /** Per-doc minhash signature folded IN-ROW from the hash-set array —
    * `array_min` over each (a·h+c) mod P transform, one map-side
    * projection, zero shuffles (vs [[minhashSignature]]'s grouped min
    * over the exploded relation — identical values, minhash being
    * multiset-invariant). Documents whose set is empty (shorter than
    * the shingle width, or fully DF-capped) produce no row, matching
    * the exploded form where they have no rows to aggregate. */
  def signatureFromArrays(arrs: DataFrame): DataFrame =
    arrs.filter(size(col("hs")) > 0).select(col("doc_id") +:
      minhashParams.zipWithIndex.map { case ((a, c), k) =>
        array_min(transform(col("hs"), h => (h * a + c) % P)).as(s"mh$k")
      }: _*)

  /** Drop hashed shingles whose document frequency exceeds `maxDf` — the
    * standard hot-shingle (boilerplate) skew mitigation before any
    * shingle-keyed self-join: a shingle in d docs fans a candidate join
    * out to d² pairs, so one boilerplate phrase across the corpus turns
    * the join quadratic. The hot list is tiny by construction (only
    * shingles above the cap), so the filter is a broadcast anti-join —
    * the big relation never shuffles. Callers persist the input relation
    * so the DF pre-pass and the capped reuse share one materialization.
    * No-op at `maxDf = Long.MaxValue`. */
  def capHashed(hs: DataFrame, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) hs
    else {
      val hot = hs.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > maxDf).select(col("h"))
      hs.join(broadcast(hot), Seq("h"), "left_anti")
    }

  /** 8-column minhash signature per doc over the hashed-shingle
    * relation: min((a·h + c) mod P) per k. One shuffle (partial min
    * map-side). Signatures are invariant to duplicate (doc, shingle)
    * occurrences, so distinct and raw inputs give identical results. */
  def minhashSignature(hs: DataFrame): DataFrame =
    hs.groupBy(col("doc_id")).agg(
      minhashParams.head match { case (a, c) =>
        min((col("h") * a + c) % P).as("mh0")
      },
      minhashParams.tail.zipWithIndex.map { case ((a, c), i) =>
        min((col("h") * a + c) % P).as(s"mh${i + 1}")
      }: _*)

  /** signature → (doc_id, band_hash) rows for the LSH bucket join: band
    * j hashes signature rows 2j, 2j+1 WITH the band id folded into the
    * hash, so the bucket join needs a single bigint key instead of an
    * (int, 32-char md5 string) composite — less shuffle volume, simpler
    * hashing. */
  def lshBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(array(
      (0 until bandsOf).map { j =>
        (TextAnalysis.hash60(concat(
          lit(j.toString), lit("_"),
          col(s"mh${2 * j}").cast("string"), lit("_"),
          col(s"mh${2 * j + 1}").cast("string"))))
      }: _*)).as("bh"))

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    * Signature derivation is fully ARRAY-SIDE ([[hashedShingleArrays]]
    * → [[capArrays]] → [[signatureFromArrays]]): the per-doc shingle
    * set never shuffles, so the only corpus-shaped exchanges left are
    * the DF pre-pass (map-side partial counts) and the band-bucket
    * self-join itself. The exploded predecessor pushed ~40× the input
    * bytes through a grouped-min signature shuffle — at 5M docs that
    * transient spill exhausted a 71 GB disk (PERF.md round 13); this
    * shape removed it.
    *
    * The signature relation feeds BOTH sides of the self-join; without
    * materialization Spark re-runs the whole shingle→md5→signature
    * pipeline per side (no ReusedExchange across a broadcast/shuffle
    * split), so persist it — persisting the one-row-per-doc signatures
    * (8 longs) rather than the 4×-exploded band rows keeps the cached
    * footprint minimal; the band explode is recomputed per side
    * map-side, which is cheap. The final pair dedup is a groupBy (same
    * shuffle as distinct, clearer intent). */
  def minhashCandidates(docs: DataFrame, shingleN: Int,
      maxDf: Long = Long.MaxValue): DataFrame = {
    // ALWAYS persist the per-doc shingle arrays: the signature
    // projection reuses `hs` once per minhash column, and higher-order
    // transforms are interpreted with NO cross-column subexpression
    // elimination — unpersisted, each of the k signature columns
    // re-derives the whole tokenize→shingle→hash pipeline (measured
    // 8.3 s vs 1.3 s on q41 at sf0.1 when only the capped branch
    // cached). The cap's DF pre-pass shares the same materialization.
    val arrs0 = hashedShingleArrays(docs, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val arrs = capArrays(arrs0, maxDf)
    val sigs = signatureFromArrays(arrs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = lshBands(sigs).as("a")
    val b = lshBands(sigs).as("b")
    a.join(b,
      col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(lit(1)).select(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash per doc from token hashes: per bit, sum ±1 over
    * tokens (with repetition); fingerprint sets bits with positive sum.
    * One shuffle; the 32 bit-sums are plain aggregates (codegen'd). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
      .withColumn("h", ringHash(col("token")))
    val sums = tok.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as("s0"),
      (1 until simhashBits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"s$b")): _*)
    sums.select(col("doc_id"),
      (0 until simhashBits).map(b =>
        when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash32"))
  }

  /** Exact-duplicate groups by content fingerprint: keep = min(doc_id),
    * n_copies per group. The argmin-groupBy form is the scalable exact
    * dedup (map-side combine collapses copies early). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** n-gram Jaccard over the hashed-shingle inverted index: the
    * equi-join on the shingle hash IS the candidate generation (docs
    * sharing no shingle never pair); intersection counts group by pair;
    * sizes join back. `maxDf` caps hot-shingle fan-out (see
    * [[capHashed]]) — sizes are computed AFTER the cap, so the Jaccard
    * is over the capped shingle sets (capped-DF semantics, mirrored
    * exactly by the oracle). */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      maxDf: Long = Long.MaxValue): DataFrame = {
    // per-doc DISTINCT hash-set arrays, persisted ONCE pre-cap: the
    // string→hash shingle pipeline runs exactly once and the
    // corpus-wide distinct the exploded form needed is now a map-side
    // array_distinct; DF pre-pass, both self-join sides and the
    // per-doc sizes all derive from this one cache map-side
    val arrs = hashedShingleArrays(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = capArrays(arrs, maxDf)
    // set size is an in-row size() — the grouped count the exploded
    // form paid a doc_id shuffle for
    val sizes = capped.select(col("doc_id"),
      size(col("hs")).cast("long").as("n_sh"))
    val sh = capped.select(col("doc_id"), explode(col("hs")).as("h"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Prefix-filtered all-pairs similarity join (the AllPairs / PPJoin
    * family — Bayardo et al. '07, Xiao et al. '08; PAPERS.md): at
    * Jaccard threshold t, two shingle sets with J(A,B) ≥ t must share
    * an element within the first |X| − ⌈t·|X|⌉ + 1 elements of EACH
    * set under one global element order. So only those PREFIXES are
    * indexed and self-joined — at t = 0.9 the inverted index holds 10%
    * of each doc and the candidate join shrinks ~quadratically vs the
    * full-index join in [[jaccardPairs]]. The global order is
    * (df asc, h asc): rarest-first, the standard choice, minimizing
    * prefix collisions. Candidates also pass the length filter
    * (t·|A| ≤ |B| ∧ t·|B| ≤ |A|); the exact intersection is then
    * computed ONLY for surviving pairs from sorted shingle-set arrays
    * (`array_intersect`, O(|A|+|B|) per pair) — the full inverted
    * index is never self-joined.
    *
    * Same output contract as [[jaccardPairs]] at the same threshold
    * (the filter is lossless); use this form when t is high and the
    * corpus is large. Scale shape: both windows partition by doc_id
    * (per-doc rank/size, never global); the prefix self-join is the
    * only pair-producing shuffle.
    */
  def jaccardPrefixPairs(docs: DataFrame, n: Int,
      threshold: Double): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // Per-doc DISTINCT hash-set arrays, map-side — the corpus-wide
    // dropDuplicates exchange the exploded form paid (its largest
    // shuffle: every (doc, h) occurrence row) is now an in-row
    // array_distinct. The array cache is the compact representation;
    // the exploded view below is recomputed from it map-side per use.
    val arrs = hashedShingleArrays(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exchanges pinned to an EXPLICIT width keyed on the consumers'
    // join/agg keys (explicit-N repartition is exempt from AQE
    // cache-plan coalescing, which otherwise narrows every downstream
    // stage to 1-2 tasks at small SF — StageProbe r11: the
    // candidate-verify stage ran 930 ms on 2 of 32 cores). Keying the
    // exploded view on h makes the df aggregate AND the df join
    // partition-local: one exchange where agg+join cost two.
    val ex = arrs.select(col("doc_id"), explode(col("hs")).as("h"))
      .repartition(par, col("h"))
    val dfRel = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // ONE per-doc aggregation builds everything doc-local at once: the
    // rarest-first order (sort_array over (df, h) structs — an in-memory
    // ~|doc| sort per group), the prefix (array slice), and the full
    // shingle-set array for the later intersection. The previous
    // formulation paid two window passes PLUS a separate per-doc
    // collect_list — an extra full-corpus exchange and a corpus-wide
    // sort this shape never needs. The doc-key exchange is explicit so
    // the per-doc sort runs full-width and the cache stays wide.
    val sets = ex.join(dfRel, "h")
      .repartition(par, col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"),
        count(lit(1)).as("n_sh"))
      .select(col("doc_id"),
        transform(col("arr"), s => s("h")).as("harr"), col("n_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefix = sets.select(col("doc_id"), col("n_sh"),
      explode(slice(col("harr"), lit(1),
        (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int")))
        .as("h"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n_sh") >= ceil(lit(threshold) * col("a.n_sh")) &&
          col("a.n_sh") >= ceil(lit(threshold) * col("b.n_sh")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(lit(1)).select(col("doc_a"), col("doc_b"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("harr").as("ha"),
        col("n_sh").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("harr").as("hb"),
        col("n_sh").as("nb")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("ha"), col("hb"))).cast("bigint"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Connected components over near-dup candidate pairs — the cluster
    * resolution step that turns pairwise candidates into keep/drop
    * groups (component representative = min doc_id, the canonical
    * survivor).
    *
    * TWO-PHASE design. The edge list of a dedup graph is O(duplicate
    * pairs), orders of magnitude smaller than the corpus; when it fits
    * one executor's memory (`localEdgeThreshold`, default 10M edges ≈
    * a few hundred MB of hash map) the components come from a SINGLE
    * union-find task on an executor — one job, no rounds, no driver
    * data. Above the threshold, distributed min-label propagation with
    * pointer doubling runs (the general path); the same standard hybrid
    * every production CC uses (iterate to contract, finish locally).
    *
    * Distributed path: min-label propagation WITH POINTER DOUBLING: each round
    * (1) every vertex takes the min of its own and its neighbors'
    * labels, then (2) twice replaces its label with its label's label
    * (path halving). Propagation alone needs rounds = component
    * DIAMETER — LSH chance-collisions can chain into long paths, which
    * made the plain variant hit its round cap; the doubling step
    * collapses a path of length 2^k in ~k rounds, so `maxIter = 25`
    * covers any graph that fits in storage. Deterministic — no RNG, min
    * is commutative.
    *
    * Scale shape (100 TB): only EDGE-TOUCHED vertices iterate
    * (singletons re-attach at the end via one left join — on a dedup
    * graph that excludes the vast unique majority from every round).
    * Each round is two joins + a grouped min, all keyed on vertex id;
    * the symmetric edge list is persisted once, labels checkpointed per
    * round (lineage truncation — see below). Convergence is detected by the
    * monotone label sum — labels only decrease, so an unchanged sum
    * means an unchanged relation: one tiny aggregate per round, no
    * change-join. Driver holds one Long per round, never row data. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25, localEdgeThreshold: Long = 10000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    if (edges.count() <= localEdgeThreshold) {
      val labels = unionFindLocal(edges)
      return vertices.join(labels, col("doc_id") === col("v"), "left")
        .select(col("doc_id"),
          coalesce(col("rep"), col("doc_id")).as("rep"))
    }
    val sym = edges.select(col("doc_a").as("v"), col("doc_b").as("n"))
      .unionAll(edges.select(col("doc_b").as("v"), col("doc_a").as("n")))
      .persist(MEMORY_AND_DISK)
    def jump(df: DataFrame): DataFrame =
      df.join(df.select(col("v").as("rv"), col("rep").as("rrep")),
          col("rep") === col("rv"), "left")
        .select(col("v"),
          least(col("rep"), coalesce(col("rrep"), col("rep"))).as("rep"))
    // Lineage MUST be truncated every round (Checkpoints.truncate →
    // a materialized leaf): the jump self-joins reference the previous
    // round's plan ~4×, so without truncation the logical tree grows
    // ~4^rounds and ANALYSIS itself OOMs — the classic iterative-plan
    // blowup. Executor-local by default; a fault-tolerant cluster
    // deployment enables Checkpoints.enableReliable to survive
    // executor loss mid-build.
    var labels = sym.select(col("v")).distinct()
      .select(col("v"), col("v").as("rep"))
      .transform(Checkpoints.truncateDriven(_, eager = true))
    var prevSum = labels.agg(sum(col("rep"))).first().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nmin = sym.join(labels.select(col("v").as("n"),
          col("rep").as("nrep")), "n")
        .groupBy(col("v")).agg(min(col("nrep")).as("nrep"))
      val prop = labels.join(nmin, Seq("v"), "left")
        .select(col("v"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      val next = Checkpoints.truncateDriven(jump(jump(prop)), eager = true)
      val s = next.agg(sum(col("rep"))).first().getLong(0)
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    // Operational signal: a cap hit means the propagation may not have
    // reached fixpoint — surface it rather than silently returning.
    System.err.println(
      s"[graft.cc] ${if (converged) "fixpoint" else "ROUND CAP HIT"} " +
        s"after $i rounds")
    // labels is a materialized checkpoint leaf — safe to drop the edge
    // cache; the returned (lazy) plan reads only the final labels.
    sym.unpersist()
    vertices.join(labels.select(col("v"), col("rep")),
        col("doc_id") === col("v"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
  }

  /** (v, rep) labels for every edge-touched vertex via one union-find
    * task on an EXECUTOR (repartition(1).mapPartitions — never the
    * driver). Union-by-min keeps each tree's root = the component's
    * smallest vertex, so find() IS the canonical representative;
    * deterministic regardless of edge order. */
  private def unionFindLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val nxt = parent(c); parent(c) = r; c = nxt
          }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
          parent.getOrElseUpdate(a, find(a))
          parent.getOrElseUpdate(b, find(b))
        }
        parent.keysIterator.toArray.iterator.map(v => (v, find(v)))
      }
      .toDF("v", "rep")
  }
}
