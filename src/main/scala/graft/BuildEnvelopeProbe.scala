package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev tool: ONE policy-kind kNN-graph build over a (scale-leg) corpus
  * with its shuffle/spill ENVELOPE accounted — the instrument behind
  * the "a 10^6-vector build completes inside a bounded shuffle
  * envelope" claim (r16's disk-wall fix; re-validated whenever the
  * build's round dataflow changes). Reports wall, stage/task counts,
  * total shuffle read/write bytes, and memory/disk spill. Usage:
  *
  *   sbt "runMain graft.BuildEnvelopeProbe <sfDir> [k] [rounds] [maxBitsForced] [targetBlock]"
  *
  * The two optional trailing args force the composite
  * trained-quantizer key below its natural ~17M-vector clamp
  * (GraphInitProbe's drill mechanism), so the past-the-clamp build
  * can be enveloped at reachable corpus sizes.
  */
object BuildEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 6
    val rounds = if (args.length > 2) args(2).toInt else 2
    val maxBitsForced = if (args.length > 3) Some(args(3).toInt) else None
    val targetBlock = if (args.length > 4) args(4).toLong else 256L
    val spark = Bench.session()
    val shR = new java.util.concurrent.atomic.AtomicLong(0)
    val shW = new java.util.concurrent.atomic.AtomicLong(0)
    val spillMem = new java.util.concurrent.atomic.AtomicLong(0)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val tm = e.stageInfo.taskMetrics
        shR.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
        shW.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        spillMem.addAndGet(tm.memoryBytesSpilled)
        spillDisk.addAndGet(tm.diskBytesSpilled)
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
    })
    val base = tables.Catalog.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        ops.Similarity.intVec(col("embedding")).as("iv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val kind = maxBitsForced match {
      case Some(mb) => ops.KnnGraph.initKind(n, 4, targetBlock, maxBits = mb)
      case None => ops.KnnGraph.initKind(n, 4, targetBlock)
    }
    println(s"[envelope] n=$n kind=$kind k=$k rounds=$rounds")
    // withInitBuckets is where codebook TRAINING runs eagerly (the
    // assignment joins stay lazy and execute inside the build below)
    val tInit0 = System.nanoTime()
    val vecs = ops.KnnGraph
      .withInitBuckets(base, kind, nTrainHint = Some(n)).drop("iv")
    println(f"[envelope] init-key derivation (incl. eager codebook " +
      f"training): ${(System.nanoTime() - tInit0) / 1e9}%.1f s")
    // zero the counters AFTER draining in-flight listener events
    // (ADVICE r17): the listener has been live since before count()
    // and the eager codebook training, so without this reset the
    // printed "build:" envelope folds pre-build stages in.
    try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    catch { case _: Throwable => () }
    Seq(shR, shW, spillMem, spillDisk).foreach(_.set(0L))
    stages.set(0); tasks.set(0)
    val t0 = System.nanoTime()
    val edges = ops.KnnGraph.build(vecs, k, rounds,
      bucketCols = Seq("sb1", "sb2"), nHint = Some(n)).count()
    val wall = (System.nanoTime() - t0) / 1e9
    try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    catch { case _: Throwable => () }
    println(f"[envelope] build: $wall%.1f s, $edges edges, " +
      f"stages ${stages.get()}, tasks ${tasks.get()}, " +
      f"shuffle R ${shR.get() >> 20} MB / W ${shW.get() >> 20} MB, " +
      f"spill mem ${spillMem.get() >> 20} MB / disk ${spillDisk.get() >> 20} MB")
    spark.stop()
  }
}
