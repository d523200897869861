package graft

import org.apache.spark.sql.functions._

/** Dev tool: A/B [[ops.KnnGraph.build]]'s two refinement forms —
  * attach-embeddings-to-edges (the scale-safe r16 shape) vs
  * dedup-then-score-pairs (the r15 shape) — on one corpus, interleaved
  * ABAB·(iters) in a warm JVM with per-form min, plus a row-identity
  * cross-check. This is the measurement behind the
  * [[ops.KnnGraph.attachCrossover]] policy constant. Usage:
  *
  *   sbt "runMain graft.RefineFormProbe [sfDir] [iters] [rounds]"
  */
object RefineFormProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val rounds = if (args.length > 2) args(2).toInt else 2
    val spark = Bench.session()
    val base = tables.Catalog.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        ops.Similarity.intVec(col("embedding")).as("iv"))
    val n = base.count()
    val kind = ops.KnnGraph.initKind(n, 4)
    val vecs = ops.KnnGraph
      .withInitBuckets(base, kind, nTrainHint = Some(n)).drop("iv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val k = 6
    def run(tag: String, hint: Long): Double = {
      val t0 = System.nanoTime()
      val edges = ops.KnnGraph.build(vecs, k, rounds,
        bucketCols = Seq("sb1", "sb2"), nHint = Some(hint)).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[refine-form] $tag%-12s n=$n rounds=$rounds: $s%.3f s ($edges edges)")
      s
    }
    // identity first (also warms both code paths)
    val a = ops.KnnGraph.build(vecs, k, rounds, Seq("sb1", "sb2"),
      nHint = Some(Long.MaxValue))
    val b = ops.KnnGraph.build(vecs, k, rounds, Seq("sb1", "sb2"),
      nHint = Some(-1L))
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "refinement forms diverge")
    println(s"[refine-form] identity OK at n=$n")
    val times = (1 to iters).flatMap { _ =>
      Seq("attach" -> run("attach", Long.MaxValue),
        "score-after" -> run("score-after", -1L))
    }
    times.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (tag, ts) =>
      println(f"[refine-form] MIN $tag%-12s ${ts.map(_._2).min}%.3f s " +
        s"(runs ${ts.map(t => f"${t._2}%.2f").mkString("/")})")
    }
    spark.stop()
  }
}
