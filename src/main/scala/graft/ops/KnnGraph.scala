package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-NN-graph construction in the NN-Descent shape (Dong,
  * Moses, Li — "Efficient k-nearest neighbor graph construction for
  * generic similarity measures", WWW'11): seed each node's neighbor
  * list from a cheap blocking key, then refine by scoring
  * neighbors-of-neighbors — the "a neighbor of my neighbor is likely my
  * neighbor" step that gives the graph family (NN-Descent, HNSW's
  * neighbor heuristic) its power.
  *
  * Everything is expressed as bounded equi-joins — the Spark-first
  * reading of an algorithm usually presented as per-node local search:
  *
  *  - **init**: self-join on a sign-bucket key (`2^bits` buckets from
  *    the leading dimensions' signs — a degenerate random-hyperplane
  *    LSH whose planes are the axes), top-k per node inside the
  *    bucket. Never corpus²: pair fan-out is Σ_buckets n_b².
  *  - **refine round**: symmetrize the graph (reverse edges are
  *    candidates too, per the paper), join it with itself on the
  *    shared middle node — candidate fan-out ≤ (2k)² per node — union
  *    the current edges, exact-score, keep top-k.
  *
  * Scores use the exact integer-scaled cosine
  * ([[graft.functions.CosineScaled]]): order-free integer dot products
  * make every row bit-reproducible across engines and partitionings,
  * so a DuckDB oracle can replay construction hash-exact.
  *
  * Scale shape (100 TB): both stages are shuffle-on-key joins with
  * degree-bounded fan-out (the init key width SCALES WITH the corpus —
  * [[adaptiveBits]] keeps expected block occupancy constant, so the
  * init term stays linear; a trained quantizer is the committed path
  * past the bit clamp; refinement cost is O(N·k²) regardless of block
  * skew), and each round is one join + one windowed top-k — the
  * standard large-scale kNN-graph recipe, no driver-side state beyond
  * the loop counter.
  */
object KnnGraph {

  /** Graph-construction algorithm version for fixture stamps
    * ([[Fixtures.ensure]]) — bump when [[build]]/[[buildLayers]] or
    * [[signBucket]] change, so stored graphs rebuild instead of
    * silently replaying the old algorithm. */
  val algoVersion = 1

  /** INIT-WIDTH POLICY, as code (round-13 doctrine was scaladoc-only):
    * the sign-bucket init's pair fan-out is Σ_b n_b² ≈ N²/2^bits —
    * with `bits` FIXED it grows quadratically in the corpus, the one
    * super-linear term the 10× scale-stress named. Scaling bits with N
    * keeps expected bucket occupancy ≤ `targetBlock`, making the init
    * term N·targetBlock — linear. Returns
    * `max(floor, ⌈log2(n / targetBlock)⌉)` clamped to `maxBits`
    * (two disjoint multi-table keys must fit the embedding's leading
    * dimensions: 2·maxBits ≤ dim; beyond the clamp a trained
    * quantizer init — the q60 IVF path — is the committed answer for
    * corpora where axis-sign blocking skews). `floor` preserves the
    * deployment's chosen width on small corpora, so oracle-replayed
    * bucket values are unchanged at test scale. */
  def adaptiveBits(n: Long, floor: Int, targetBlock: Long = 256L,
      maxBits: Int = 16): Int = {
    require(floor >= 1 && floor <= maxBits && targetBlock >= 1,
      s"adaptiveBits: need 1 <= floor($floor) <= maxBits($maxBits), " +
        s"targetBlock($targetBlock) >= 1")
    var bits = floor
    while (bits < maxBits && n.toDouble / (1L << bits) > targetBlock) bits += 1
    bits
  }

  /** The init blocking-key KIND for a corpus — which key family, and
    * its width. Sign buckets cost nothing to derive but have at most
    * 2^maxBits distinct values (two disjoint multi-table keys must fit
    * the embedding's leading dims); a trained quantizer has unbounded
    * cells and adapts to density, but costs training passes. */
  sealed trait InitKind
  object InitKind {
    /** Multi-table axis-sign LSH, `bits` per table. */
    final case class SignBuckets(bits: Int) extends InitKind
    /** Trained coarse-quantizer cells ([[KMeans]] codebooks, one per
      * table, independently seeded), COMPOSED with `subBits` axis-sign
      * bits inside each cell: bucket = cid·2^subBits + signs. The
      * composite is what keeps the policy linear: occupancy is
      * n/(cells·2^subBits), so `cells` stays tiny (the sign bits carry
      * 2^subBits of the split for free, map-side) and the one real
      * cost of a trained key — the n·cells·dim assignment — never
      * grows past rounding error of the scan itself. `subBits = 0`
      * degenerates to the pure cell id (the fixed-width q221 drill). */
    final case class QuantizerCells(cells: Int, subBits: Int)
      extends InitKind
  }

  /** INIT-KEY POLICY INCLUDING PAST THE CLAMP, as code: sign buckets
    * at [[adaptiveBits]]'s width while that keeps expected occupancy
    * ≤ `targetBlock`; once the bit clamp binds AND occupancy still
    * exceeds the target (≈17M vectors at the defaults), the init key
    * becomes the q60 trained-quantizer cell id COMPOSED with the
    * clamped sign bits — `cells = ⌈n / (targetBlock·2^maxBits)⌉`
    * k-means cells per table, each sub-split by the same `maxBits`
    * axis signs the clamp already pays for, so expected occupancy
    * returns to `targetBlock` at ANY corpus size and the init term
    * stays N·targetBlock, linear. The composite is deliberate: a PURE
    * cell key would need n/targetBlock cells and its n·cells·dim
    * assignment pass would grow quadratically (≈3 h of cluster time
    * at 10^9 vectors); composed, `cells` is 2 at the 17M boundary,
    * ~60 at 10^9 and ~6000 at 10^11 — the assignment stays within a
    * small factor of the scan, and k-means cells still absorb the
    * density skew that axis signs alone cannot. */
  def initKind(n: Long, floor: Int, targetBlock: Long = 256L,
      maxBits: Int = 16): InitKind = {
    val bits = adaptiveBits(n, floor, targetBlock, maxBits)
    if (bits == maxBits && n.toDouble / (1L << bits) > targetBlock) {
      val per = targetBlock * (1L << maxBits)
      val cells = (n + per - 1) / per
      InitKind.QuantizerCells(
        math.min(cells, Int.MaxValue.toLong).toInt, maxBits)
    } else InitKind.SignBuckets(bits)
  }

  /** Attach one blocking-key column per name to `vecs` (which must
    * carry `vec_id` and the integer-scaled `iv`) according to `kind`:
    * sign-bucket tables over disjoint leading dims, or — past the
    * clamp — independently-seeded trained-quantizer cell ids
    * ([[KMeans.trainCodebook]] seed slice t, [[KMeans.assignCell]]
    * full-corpus assignment, one keyed join per table). `trainSampleMod`
    * trains each codebook on the deterministic `vec_id % mod = 0`
    * sample — at 10^7+ vectors the Lloyd update doesn't need every
    * row, only the assignment does. `nTrainHint` is the train-side
    * row count when the caller already knows it (parquet footers,
    * [[MetadataMax.parquetRowCount]] style) — without it the
    * seed-slice clamp below costs one full count() pass over a
    * potentially 10^9-row corpus before training starts. */
  def withInitBuckets(vecs: DataFrame, kind: InitKind,
      names: Seq[String] = Seq("sb1", "sb2"), trainIters: Int = 2,
      trainSampleMod: Long = 1L,
      nTrainHint: Option[Long] = None): DataFrame = kind match {
    case InitKind.SignBuckets(bits) =>
      names.zipWithIndex.foldLeft(vecs) { case (df, (nm, i)) =>
        df.withColumn(nm, signBucket(col("iv"), bits, i * bits))
      }
    case InitKind.QuantizerCells(cells, subBits) =>
      val train =
        if (trainSampleMod <= 1L) vecs
        else vecs.filter(col("vec_id") % trainSampleMod === 0)
      // [[initKind]]'s cells formula assumes policy-scale N; a forced
      // clamp on a tiny corpus (GraphInitProbe, specs) — or a large
      // trainSampleMod at scale — would ask trainCodebook for more
      // disjoint seed slices than rows exist and trip its require.
      // Degrade deterministically instead: shrink cells so every
      // table can seed its slice (LOUDLY — a silently narrower key
      // than the stamp records was the r16 ADVICE finding), and below
      // one cell per table fall back to the sign-bucket key outright.
      val nTrain = nTrainHint.getOrElse(train.count())
      val usable = math.min(cells.toLong, nTrain / math.max(names.length, 1))
      if (usable < cells)
        System.err.println(s"[graft] WARN withInitBuckets: codebook " +
          s"clamped to $usable of $cells cells (train rows $nTrain, " +
          s"${names.length} disjoint seed slices) — the effective init " +
          s"key is narrower than the policy width")
      if (usable < 1L)
        withInitBuckets(vecs,
          InitKind.SignBuckets(math.max(subBits, 1)), names)
      else {
        // Train the per-table codebooks on CONCURRENT driver threads:
        // each training is an independent chain of tiny jobs (seed
        // collect, per-pass assignment + centroid collect), and
        // running the chains sequentially stacks their per-job
        // scheduling floors end to end — measured r17
        // (DriverFloorProbe, q221: ~50% of wall is inter-job driver
        // gaps). Concurrent submission is the standard Spark
        // multi-job pattern; results are unaffected by interleaving
        // (disjoint seed slices, deterministic Lloyd math), only the
        // driver floors overlap. At cluster scale the FIFO scheduler
        // interleaves the chains' tasks — total work is unchanged.
        // Dedicated pool, not ExecutionContext.global (ADVICE r17):
        // each training BLOCKS on Spark actions, so on the shared
        // global pool a caller already using it could starve or
        // serialize the chains; a pool sized to the table count keeps
        // the concurrency self-contained and is shut down after Await.
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          names.length,
          (r: Runnable) => {
            val th = new Thread(r, "graft-codebook-train")
            th.setDaemon(true)
            th
          })
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        val cents =
          try Await.result(
            Future.sequence(names.indices.map { t =>
              Future(t -> KMeans.trainCodebook(train, usable.toInt,
                trainIters, seedRank = t))
            }), Duration.Inf).toMap
          finally pool.shutdown()
        names.zipWithIndex.foldLeft(vecs) { case (df, (nm, t)) =>
          val asg = KMeans.assignCell(vecs, cents(t))
            .select(col("vec_id"), col("cid"))
          // composite bucket: trained cell, sub-split by this table's
          // disjoint sign-bit slice (map-side, free) — see initKind
          val bucket =
            if (subBits == 0) col("cid")
            else col("cid") * (1L << subBits) +
              signBucket(col("iv"), subBits, t * subBits)
          df.join(asg, "vec_id").withColumn(nm, bucket).drop("cid")
        }
      }
  }

  /** Blocking key: sign bits of `bits` dimensions of the
    * integer-scaled vector starting after `offset` (1-based
    * `element_at`, matching the oracle's `iv[i]`). Several keys over
    * disjoint dimension ranges give independent "hash tables" — the
    * standard multi-table LSH trick that lifts init recall: a true
    * neighbor pair only needs to agree on ONE key's signs. */
  def signBucket(iv: Column, bits: Int, offset: Int = 0): Column =
    (0 until bits).map(i =>
      when(element_at(iv, offset + i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** REFINEMENT-FORM POLICY, as code (mirrors [[initKind]]): [[build]]
    * carries BOTH refinement forms — attach endpoint embeddings to the
    * N·2k EDGE relation before the neighbors-of-neighbors fan-out (the
    * r16 shape whose shuffled payload is bounded by the edge relation:
    * the form that keeps a 10^6-vector build inside a ~3 GB shuffle
    * envelope where scoring the fanned-out pairs filled 60 GB of disk
    * and died), or dedup the skinny pair fan-out and score it after
    * (the r15 shape). Both produce identical pair sets, scores and
    * tie-breaks (KnnGraphSpec pins equality; the DuckDB oracle replay
    * pins it end-to-end), so the choice is pure planning.
    *
    * The crossover was MEASURED r17 ([[graft.RefineFormProbe]],
    * interleaved warm min-of-3): attach wins at EVERY size — 2.29 vs
    * 2.39 s at 2·10^3 vectors, 12.40 vs 13.56 s at 2·10^4, and at
    * 10^6 it is the only form that completes on one box. The r16
    * window's +0.3 s q164 reading that had been attributed to the
    * attach joins does not reproduce under a controlled A/B — it was
    * window drift. So the policy is the degenerate crossover 0:
    * attach everywhere. The score-after form (and the `nHint` plumbing
    * that can force it) stays as the spec's bit-identity witness and
    * as the re-tuning lever should a future corpus/hardware regime
    * move the crossover — the probe that measures it is committed. */
  val attachCrossover = 0L

  /** True = attach-embeddings-to-edges refinement; false =
    * dedup-then-score-pairs. See [[attachCrossover]]. With the
    * measured degenerate crossover, only a NEGATIVE `n` — which no
    * real corpus has — selects the score-after witness; the spec and
    * [[graft.RefineFormProbe]] use that to exercise both forms. */
  def refineAttach(n: Long): Boolean = n >= attachCrossover

  /** Top-`k` edges per source node by (cosine desc, target asc) from a
    * scored candidate-edge relation (u, v, cosine). */
  private def topKPerNode(scored: DataFrame, k: Int): DataFrame =
    topKPerNodeScored(scored, k).select(col("u"), col("v"))

  /** [[topKPerNode]] keeping the cosine — [[build]]'s rounds carry the
    * score so kept edges are never re-scored. DISTINCT SEMANTICS:
    * duplicate (u, v, cosine) rows count once — callers feed raw
    * candidate unions and this ranking dedups them.
    *
    * ONE exchange ([[graft.functions.TopKEdgesAgg]]): per-node dedup +
    * (cosine desc, v asc) rank + keep-k fold into a single bounded
    * aggregation whose map-side partials carry ≤ k entries per
    * (mapper, node). The `distinct()` + `row_number` window pair this
    * replaces shuffled the full candidate relation TWICE — and under
    * AQE each exchange is a separately-materialized query stage, the
    * per-stage driver loop DriverFloorProbe measured as most of a
    * small-corpus build's wall (26 jobs / 0.1 s ideal compute on a
    * 2.4 s q164). [[plans.TopKPerGroup]] has the same shuffle
    * discipline but ranks the MULTISET (a duplicate candidate would
    * eat one of the k slots), so the graph family needs the fused
    * dedup+rank form. */
  private[graft] def topKPerNodeScored(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("u"))
      .agg(graft.functions.TopKEdgesAgg
        .edges(col("v"), col("cosine"), k).as("top"))
      .select(col("u"), explode(col("top")).as("e"))
      .select(col("u"), col("e.v").as("v"), col("e.cosine").as("cosine"))

  /** The `distinct() + row_number ≤ k` window formulation — the
    * bit-identity WITNESS for [[topKPerNodeScored]] (KnnGraphSpec
    * property-pins agreement on adversarial candidate multisets:
    * duplicates, cosine ties, sub-k groups). Not on any hot path. */
  private[graft] def topKPerNodeScoredWindow(scored: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("cosine").desc, col("v"))
    scored.distinct().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select(col("u"), col("v"), col("cosine"))
  }

  /** Score candidate pairs (u, v) with exact cosine by joining the
    * vector relation in on both endpoints. Public: downstream
    * consumers (graph-based dedup) re-score stored edges the same
    * way. */
  def score(cand: DataFrame, vecs: DataFrame): DataFrame =
    cand
      .join(vecs.select(col("vec_id").as("u"), col("embedding").as("ea")), "u")
      .join(vecs.select(col("vec_id").as("v"), col("embedding").as("eb")), "v")
      .select(col("u"), col("v"),
        graft.functions.CosineScaled(col("ea"), col("eb")).as("cosine"))

  /** Undirected view of a directed edge set: e ∪ reverse(e), distinct. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()

  /** Build the directed k-NN graph over `vecs` (vec_id, embedding, and
    * one column per blocking key in `bucketCols`) — multi-table
    * sign-bucket init plus `rounds` NN-Descent refinement passes.
    * Returns edges (u, v), ≤ k per u.
    *
    * Each round ends in [[Checkpoints.truncate]] (executor-local by
    * default; reliable against a checkpoint dir when the deployment
    * enables it — the connected-components lesson,
    * `Dedup.connectedComponents`): every round references its
    * predecessor ~5× (symmetrize reads it twice, the candidate join
    * reads the symmetrized form twice, the union reads it again), and
    * Spark shares no common logical subplans — left lazy, each
    * reference re-embeds the previous round's whole chain, the tree
    * (and the driver's analysis/planning time with it) grows ~5× per
    * round, and a 2-round build on 2k vectors spent 40s almost
    * entirely in the driver. persist() alone does NOT fix this: cached
    * execution still carries the full duplicated lineage through
    * analysis and canonicalization. The checkpoint truncates the plan
    * to an executor-materialized leaf — O(k·N) rows per round, the
    * standard shape for iterative graph algorithms at scale. */
  def build(vecs: DataFrame, k: Int, rounds: Int = 1,
      bucketCols: Seq[String] = Seq("sb"),
      nHint: Option[Long] = None): DataFrame = {
    // SHUFFLE DISCIPLINE (the r16 disk-wall lesson, measured on a
    // 1M-vector leg): scoring candidates by joining embeddings onto
    // the fanned-out PAIR relation shuffles ~0.5 KB of vector payload
    // per candidate — N·occupancy·0.5 KB for init (60+ GB at 1M×64,
    // unbounded at policy scale). Instead the cosine is computed WHERE
    // the vectors already sit co-located: inside the bucket self-join
    // (zero extra payload movement — the bucket shuffle already
    // carried each vector once), and for refinement — per
    // [[refineAttach]]'s corpus-size policy — by attaching endpoint
    // embeddings to the EDGE relation (N·2k rows) before the
    // neighbors-of-neighbors fan-out: k× less payload than scoring
    // the (u,w) pairs after. Rounds carry (u, v, cosine), so kept
    // edges are never re-scored on the attach path. Pair sets, scores
    // (exact integer arithmetic) and (cosine desc, v) tie-breaks are
    // identical across both refinement forms — the oracle replays pin
    // hash-equality.
    //
    // Why symmetrize KEEPS its distinct when the candidate ranking
    // fused its own (TopKEdgesAgg dedups anyway): a duplicate sym row
    // — every mutual edge, typically half the graph — would ride the
    // attach joins carrying a ~0.5 KB embedding payload per copy
    // (~k·vecbytes extra per node), where the distinct it would save
    // shuffles only the skinny (u, v) pair (~2k·16 B per node). The
    // payload discipline above wins that trade by ~10× at any scale.
    val attach = nHint.forall(refineAttach)
    val emb = vecs.select(col("vec_id"), col("embedding"))
    val scored0 = bucketCols.map { c =>
      vecs.as("a").join(vecs.as("b"),
          col(s"a.$c") === col(s"b.$c") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"),
          graft.functions.CosineScaled(
            col("a.embedding"), col("b.embedding")).as("cosine"))
    }.reduce(_ unionByName _) // cross-table dups collapse in the topK agg
    val init = Checkpoints.truncate(topKPerNodeScored(scored0, k),
      eager = false)
    val out = (1 to rounds).foldLeft(init) { (g, _) =>
      val sym = symmetrize(g.select(col("u"), col("v")))
      val cand =
        if (attach) {
          val s1 = sym.select(col("u"), col("v").as("mid"))
            .join(emb.select(col("vec_id").as("u"),
              col("embedding").as("ue")), "u")
          val s2 = sym.select(col("u").as("mid"), col("v").as("w"))
            .join(emb.select(col("vec_id").as("w"),
              col("embedding").as("we")), "w")
          val fresh = s1.join(s2, "mid")
            .filter(col("u") =!= col("w"))
            .select(col("u"), col("w").as("v"),
              graft.functions.CosineScaled(col("ue"), col("we")).as("cosine"))
          fresh.unionByName(g) // dups collapse in the topK agg
        } else {
          // small-N form: fan out SKINNY (u, v) pairs and dedup them
          // BEFORE attaching any payload — below the crossover the
          // distinct collapse is worth more than avoiding the
          // pair-side scoring joins (see [[refineAttach]])
          val pairs = sym.select(col("u"), col("v").as("mid"))
            .join(sym.select(col("u").as("mid"), col("v")), "mid")
            .filter(col("u") =!= col("v"))
            .select(col("u"), col("v"))
            .unionByName(g.select(col("u"), col("v")))
            .distinct()
          score(pairs, emb)
        }
      Checkpoints.truncate(topKPerNodeScored(cand, k), eager = false)
    }
    out.select(col("u"), col("v"))
  }

  /** Graph-traversal search (the HNSW search pattern as dataflow):
    * entry beam = top-`beam` of the query's blocks (any key), `hops`
    * frontier-join expansions over the undirected graph, exact rerank
    * of everything visited. Each hop is one equi-join on the frontier
    * (fan-out ≤ beam·(2k)^hop) — no per-node sequential walk, no
    * driver state. */
  def search(vecs: DataFrame, edges: DataFrame, queryId: Long, beam: Int,
      topK: Int, bucketCols: Seq[String] = Seq("sb"),
      hops: Int = 2): DataFrame = {
    val sym = symmetrize(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = vecs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe") +:
        bucketCols.map(c => col(c).as(s"q$c")): _*)
    val samePred = bucketCols.map(c => col(c) === col(s"q$c")).reduce(_ || _)
    val entry = vecs.join(broadcast(q),
        samePred && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        graft.functions.CosineScaled(col("embedding"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(beam)
      .select(col("vec_id"))
    def hop(frontier: DataFrame): DataFrame =
      frontier.as("f").join(sym.as("s"), col("f.vec_id") === col("s.u"))
        .select(col("s.v").as("vec_id")).distinct()
    val frontiers = (1 to hops).scanLeft(entry)((f, _) => hop(f))
    val visited = frontiers.reduce(_ unionByName _).distinct()
      .filter(col("vec_id") =!= queryId)
    val ranked = visited.join(vecs, "vec_id")
      .crossJoin(broadcast(q.select(col("qe"))))
      .select(col("vec_id"),
        graft.functions.CosineScaled(col("embedding"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
    // Materialize the ≤ topK result rows eagerly so the corpus-sized
    // symmetrized edge cache can be released NOW — search is called
    // many times per session (q153 audits, registry runs) and leaked
    // MEMORY_AND_DISK blocks otherwise accumulate for its lifetime.
    val out = Checkpoints.truncate(ranked, eager = true)
    sym.unpersist()
    out
  }

  /** LAYERED (hierarchical) graph — true HNSW layering: layer 0 is
    * the full k-NN graph; layer ℓ is a k-NN graph over the
    * deterministic 1/levelMod^ℓ node sample (`vec_id % levelMod^ℓ =
    * 0` — the hash-sample analog of HNSW's geometric level draw,
    * deterministic so a DuckDB oracle replays it). Returns one edge
    * relation (u, v, layer).
    *
    * Scale shape: total build cost is a geometric series ≈
    * build(N)·levelMod/(levelMod−1) — the hierarchy costs ~11% extra
    * at levelMod=10 — and search depth becomes O(log N) layers of one
    * bounded join each, vs the flat graph's fixed-hop beam whose
    * entry stage scans a whole hash bucket (~N/2^bits). */
  def buildLayers(vecs: DataFrame, k: Int, rounds: Int = 1,
      bucketCols: Seq[String] = Seq("sb"), levelMod: Long = 10L,
      levels: Int = 2, nHint: Option[Long] = None): DataFrame =
    (0 to levels).map { l =>
      val mod = math.pow(levelMod.toDouble, l.toDouble).toLong
      // layer ℓ holds ~n/levelMod^ℓ nodes — the refinement-form policy
      // applies to each layer's OWN size, so upper layers of a huge
      // corpus may legitimately take the small-N form
      build(vecs.filter(col("vec_id") % mod === 0), k, rounds, bucketCols,
          nHint = nHint.map(_ / mod))
        .withColumn("layer", lit(l))
    }.reduce(_ unionByName _)

  /** Greedy descent over a layered graph: score ALL top-layer nodes
    * (the top layer is O(N/levelMod^levels) — tiny by construction),
    * keep a beam, then per layer expand the beam one hop through that
    * layer's undirected edges and re-beam; layer 0 expands twice and
    * reranks. Depth = `levels` + 2 bounded joins, each ≤
    * beam·(2k+1) candidates — no bucket scan, no fixed wide frontier.
    * The query node itself may ride the beam (it is its own best
    * entry); only the final rerank excludes it. */
  def searchLayers(vecs: DataFrame, layered: DataFrame, queryId: Long,
      beam: Int, topK: Int, levelMod: Long = 10L,
      levels: Int = 2): DataFrame = {
    val q = vecs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    def scored(cand: DataFrame): DataFrame =
      cand.join(vecs, "vec_id").crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.functions.CosineScaled(col("embedding"), col("qe"))
            .as("cosine"))
    def beamOf(cand: DataFrame, width: Int): DataFrame =
      scored(cand).orderBy(col("cosine").desc, col("vec_id"))
        .limit(width).select(col("vec_id"))
    // PIN each descent step (r18): every step's DataFrame is consumed
    // TWICE downstream (`f` and `f.join` inside hopIn; the nested
    // layer-0 double hop), so left lazy the beam subtrees re-expand
    // ~2× per level — the explained plan carried 13 TakeOrdered /
    // 33 BroadcastExchange and one probe materialized 78 one-task AQE
    // stage-jobs of ~70-130 ms driver floor each (the whole fresh-JVM
    // premium DriverFloorProbe attributed). Persisting the ≤ beam- or
    // fanout-sized step makes downstream references plan as
    // InMemoryRelation leaves: each step's dataflow runs ONCE. The
    // pins are bounded (≤ beam·(2k+1) rows); the caller-facing result
    // is eagerly truncated and the pins released before returning, the
    // [[search]] cache-hygiene pattern.
    val pins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pins += p
      p
    }
    val topMod = math.pow(levelMod.toDouble, levels.toDouble).toLong
    val entryTop = pin(beamOf(
      vecs.filter(col("vec_id") % topMod === 0).select(col("vec_id")), beam))
    def hopIn(l: Int)(f: DataFrame): DataFrame = {
      val sym = symmetrize(layered.filter(col("layer") === l)
        .select(col("u"), col("v")))
      f.unionByName(
        f.as("f").join(sym.as("s"), col("f.vec_id") === col("s.u"))
          .select(col("s.v").as("vec_id"))).distinct()
    }
    val entry0 = (levels - 1 to 1 by -1).foldLeft(entryTop) { (entry, l) =>
      pin(beamOf(hopIn(l)(entry), beam))
    }
    // layer 0: two hops from the descended beam, one exact rerank
    val candidates = hopIn(0)(pin(hopIn(0)(entry0)))
    val ranked = scored(candidates.filter(col("vec_id") =!= queryId))
      .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
    val out = Checkpoints.truncate(ranked, eager = true)
    // under explain mode the (lazy) returned plan must keep resolving
    // the pins to InMemoryRelation leaves — the executed shape; the
    // audit session leaks only beam-sized cache entries
    if (!Checkpoints.explainEnabled) pins.foreach(_.unpersist())
    out
  }

  /** Incrementally maintain a k-NN graph when a delta of new vectors
    * arrives — the operation a growing corpus needs, because
    * rebuilding the whole graph per append is a full corpus pass.
    * `all` must carry the same shape as [[build]]'s input and contain
    * BOTH generations; `isDelta` marks the new rows; `base` is the
    * existing graph over the old rows only.
    *
    * Two bounded steps, both delta-proportional:
    *  - **new nodes**: candidates = bucket-mates anywhere in the
    *    corpus (either key) ∪ one hop through a hist bucket-mate's
    *    existing edges (the graft-onto-the-graph step NN-Descent
    *    would discover over rounds), exact-score, top-k.
    *  - **old nodes**: candidates = their existing edges ∪ delta
    *    bucket-mates, re-top-k — an old neighbor only loses its slot
    *    to a strictly better new arrival.
    *
    * Cost is O(|delta|·blockwidth + |affected hist|·k) — never a
    * rebuild; with an empty delta the result IS `base` (re-ranking a
    * node's own edge set is the identity), the spec-pinned fixpoint.
    * Returns the maintained directed graph (u, v), ≤ k per u. */
  def maintain(all: DataFrame, base: DataFrame, isDelta: Column, k: Int,
      bucketCols: Seq[String] = Seq("sb")): DataFrame = {
    val hist = all.filter(!isDelta)
    val delta = all.filter(isDelta)
    def bucketPairs(l: DataFrame, r: DataFrame): DataFrame =
      bucketCols.map { c =>
        l.as("a").join(r.as("b"),
            col(s"a.$c") === col(s"b.$c") &&
              col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
      }.reduce(_ unionByName _)
    val hop = bucketCols.map { c =>
      delta.as("a").join(hist.as("m"), col(s"a.$c") === col(s"m.$c"))
        .select(col("a.vec_id").as("u"), col("m.vec_id").as("mid"))
    }.reduce(_ unionByName _)
      .join(base.select(col("u").as("mid"), col("v")), "mid")
      .select(col("u"), col("v")).filter(col("u") =!= col("v"))
    val newEdges = topKPerNode(
      score(bucketPairs(delta, all).unionByName(hop).distinct(), all), k)
    // Only AFFECTED history nodes (those with at least one delta
    // bucket-mate) re-rank; an unaffected node's edges pass through
    // UNTOUCHED and unscored — re-ranking a node's own edge set is
    // the identity (the spec-pinned fixpoint), so results are
    // unchanged, but scoring drops from O(N·k) to O(|affected|·k) —
    // the delta-proportionality the operator promises. At a
    // production delta fraction (~1%) almost every history node
    // skips the rescore entirely.
    val deltaPairs = bucketPairs(hist, delta)
    val affected = deltaPairs.select(col("u")).distinct()
    val histCand = deltaPairs
      .unionByName(base.join(affected, "u").select(col("u"), col("v")))
      .distinct()
    val updated = topKPerNode(score(histCand, all), k)
    val untouched = base.join(affected, Seq("u"), "left_anti")
    Checkpoints.truncate(
      untouched.unionByName(updated).unionByName(newEdges),
      eager = false)
  }
}
