package graft

import org.apache.spark.sql.functions._

import graft.ops.{Checkpoints, Dedup, KnnGraph, Similarity}
import graft.tables.Catalog

/** The reliable-checkpoint switch for iterative builds: semantics are
  * identical to the default executor-local mode (same rows, bit for
  * bit), and the reliable mode actually writes round state to the
  * checkpoint directory — the property that buys executor-loss
  * recovery on a real cluster. */
class CheckpointsSpec extends SparkSuite {

  private val dir = "/tmp/graft_ckpt_spec"

  private def rmrf(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf); f.delete(); ()
  }

  private def vecs = Catalog.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"),
      KnnGraph.signBucket(Similarity.intVec(col("embedding")), 4).as("sb"))

  test("reliable mode is bit-identical to local mode and writes round state") {
    rmrf(new java.io.File(dir))
    val local = KnnGraph.build(vecs, 6, rounds = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(!Checkpoints.reliableEnabled)
    Checkpoints.enableReliable(spark, dir)
    try {
      assert(Checkpoints.reliableEnabled)
      val rel = KnnGraph.build(vecs, 6, rounds = 1)
        .collect().map(_.toString).sorted.toSeq
      assert(rel == local)
    } finally Checkpoints.disableReliable()
    assert(!Checkpoints.reliableEnabled)
    // round state reached the reliable directory
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
    assert(files.nonEmpty, "reliable mode must write to the checkpoint dir")
  }

  test("explain mode exposes the full construction plan, and turning " +
      "it off restores truncation") {
    Checkpoints.enableExplainMode()
    val plan =
      try KnnGraph.build(vecs, 6, rounds = 1)
        .queryExecution.executedPlan.toString
      finally Checkpoints.disableExplainMode()
    // with truncation as identity the per-round ranking aggregate and
    // the corpus scan are IN the explained plan (the former PLAN_AUDIT
    // † blind spot); normally the plan stops at the checkpoint leaf
    assert(plan.contains("topk_edges"),
      s"construction ranking missing from explain-mode plan:\n$plan")
    assert(!plan.contains("ExistingRDD"),
      s"checkpoint leaf survived in explain mode:\n$plan")
    val after = KnnGraph.build(vecs, 6, rounds = 1)
      .queryExecution.executedPlan.toString
    assert(after.contains("ExistingRDD") && !after.contains("topk_edges"),
      s"truncation not restored after disableExplainMode:\n$after")
  }

  test("connected components agree across modes (distributed path)") {
    val s = spark
    import s.implicits._
    // a path graph + an isolated vertex, forced through the
    // distributed label-propagation branch
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val local = Dedup.connectedComponents(verts, edges,
        localEdgeThreshold = 0L)
      .collect().map(_.toString).sorted.toSeq
    Checkpoints.enableReliable(spark, dir)
    try {
      val rel = Dedup.connectedComponents(verts, edges,
          localEdgeThreshold = 0L)
        .collect().map(_.toString).sorted.toSeq
      assert(rel == local)
    } finally Checkpoints.disableReliable()
  }
}
