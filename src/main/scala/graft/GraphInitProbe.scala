package graft

import org.apache.spark.sql.functions._

/** Dev tool: A/B the kNN-graph INIT KINDS on one corpus — the policy
  * key at the defaults vs the composite quantizer·sign key forced past
  * a lowered bit clamp — printing build wall time, bucket-occupancy
  * stats and mean edge cosine (the equal-k quality proxy: both builds
  * keep top-k per node, so a better init shows up as better neighbors,
  * not more of them). Usage:
  *
  *   sbt "runMain graft.GraphInitProbe [sfDir] [maxBitsForced] [targetBlock] [reverse]"
  *
  * `targetBlock` (default 256) scales BOTH kinds' bucket occupancy —
  * the init self-join's pair volume is N·occupancy·tables, and on a
  * single box the scored-pair shuffle is the probe's disk high-water
  * mark (the r16 1M-vector run at occupancy 256 needed >60 GB and
  * died; 64 fits). Lowering it keeps the A/B equal-width/equal-occ
  * while RAISING the composite's cell count — the training-cost-at-
  * size evidence the probe exists to collect.
  *
  * The probe exists because the composite path fires only past ~17M
  * vectors at the shipped defaults — three decades beyond the bundled
  * testdata — so its measured evidence comes from forcing the clamp
  * lower on a scale leg (e.g. `tools/build_scale.py 100` embeddings,
  * 200k vectors, maxBits=8 → 4 cells × 256 signs per table) and
  * comparing against the sign key the policy would otherwise pick.
  */
object GraphInitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val forcedMaxBits = if (args.length > 1) args(1).toInt else 8
    val targetBlock = if (args.length > 2) args(2).toLong else 256L
    val spark = Bench.session()
    val base = tables.Catalog.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        ops.Similarity.intVec(col("embedding")).as("iv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val k = 6

    def run(tag: String, kind: ops.KnnGraph.InitKind): Unit = {
      val t0 = System.nanoTime()
      val bucketed = ops.KnnGraph
        .withInitBuckets(base, kind, nTrainHint = Some(n))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val occ = bucketed.groupBy("sb1").count()
        .agg(max("count").as("mx"), avg("count").as("av"),
          count(lit(1)).as("nb")).head()
      // the init self-join's true pair volume: Σ_b n_b² over BOTH
      // tables (variance, not average occupancy, is what costs)
      val pairVol = Seq("sb1", "sb2").map { c =>
        bucketed.groupBy(c).count()
          .agg(sum(col("count") * col("count"))).head().getLong(0)
      }.sum
      val g = ops.KnnGraph.build(bucketed, k, rounds = 2,
        bucketCols = Seq("sb1", "sb2"), nHint = Some(n))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = g.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val quality = ops.KnnGraph.score(g, bucketed).agg(avg("cosine"))
        .head().getDouble(0)
      println(f"[init-probe] $tag%-10s n=$n kind=$kind: " +
        f"$secs%.2f s, edges=$edges, pair_vol=$pairVol, " +
        f"buckets=${occ.getLong(2)}, max_occ=${occ.getLong(0)}, " +
        f"avg_occ=${occ.getDouble(1)}%.1f, mean_cosine=$quality%.6f")
      g.unpersist(); bucketed.unpersist()
    }

    // order is a flag because the FIRST build pays the session's
    // whole-stage-codegen/JIT warm-up — A/B both orders before
    // believing a wall-time delta
    val runs = Seq(
      "policy" -> ops.KnnGraph.initKind(n, 4, targetBlock),
      "composite" -> ops.KnnGraph.initKind(n, 4, targetBlock,
        maxBits = forcedMaxBits))
    val mode = if (args.length > 3) args(3) else ""
    val ordered = if (mode == "reverse") runs.reverse else runs
    // each kind twice: the second reading per kind is steady-state
    // (first-position builds carry the session's codegen/JIT warm-up).
    // mode "phases" skips the A/B builds entirely — the standalone
    // train/assign split for cell counts where even one full build
    // blows the measurement budget.
    if (mode != "phases")
      (ordered ++ ordered).foreach { case (tag, kind) => run(tag, kind) }

    // PHASE SPLIT for the composite kind (r15 VERDICT #1): time the
    // codebook training and the full-corpus assignment separately from
    // the graph build they feed — at hundreds of cells the training
    // passes stop being noise, and this is where that shows or doesn't.
    // Runs AFTER the A/B rows so the JVM is warm (steady-state split).
    ops.KnnGraph.initKind(n, 4, targetBlock, maxBits = forcedMaxBits) match {
      case ops.KnnGraph.InitKind.QuantizerCells(cells, subBits) =>
        for (t <- 0 to 1) {
          val t0 = System.nanoTime()
          val cent = ops.KMeans.trainCodebook(base, cells, 2, seedRank = t)
          val tTrain = (System.nanoTime() - t0) / 1e9
          // aggregate over BOTH computed columns: a bare count() lets
          // Catalyst prune the whole argmin projection and times an
          // empty scan (the 1.14 s phantom this line first printed).
          // A/B the SHIPPED codegen'd argmin (assignCell) against the
          // interpreted-HOF fold it replaced (assignFolded) — the
          // named r16 lever, measured per table at this cell count —
          // and cross-check the d2 sums agree (bit-identity at size,
          // on top of KnnGraphSpec's row-level pin).
          val t1 = System.nanoTime()
          val cellRow = ops.KMeans.assignCell(base, cent)
            .agg(count(col("cid")).as("n"), sum(col("d2")).as("sd"))
            .head()
          val tCell = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val foldRow = ops.KMeans.assignFolded(base, cent)
            .agg(count(col("cid")).as("n"), sum(col("d2")).as("sd"))
            .head()
          val tFold = (System.nanoTime() - t2) / 1e9
          require(cellRow.getLong(0) == foldRow.getLong(0) &&
            cellRow.getLong(1) == foldRow.getLong(1),
            s"assignCell/assignFolded diverge at size: $cellRow vs $foldRow")
          println(f"[init-phase] table=$t cells=$cells subBits=$subBits: " +
            f"train=$tTrain%.2f s (2 Lloyd passes incl. seed collect), " +
            f"assignCell=$tCell%.2f s, assignFolded=$tFold%.2f s " +
            f"(${cellRow.getLong(0)} rows, d2 sum ${cellRow.getLong(1)})")
        }
      case other =>
        println(s"[init-phase] forced kind is not QuantizerCells ($other); " +
          "no split to measure")
    }
    spark.stop()
  }
}
