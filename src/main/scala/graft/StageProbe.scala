package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: per-STAGE attribution for one registered query — job/stage
  * ids, wall duration, task count, shuffle read/write MB and the stage's
  * callsite name, after one untimed warmup run. Where a wall-clock
  * number says "slow", this says WHICH exchange. Usage:
  *
  *   sbt "runMain graft.StageProbe <queryName> [sfDir]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Bench.session()
    val q = SparkEntry.queries(name)
    q(spark, sfDir).count() // warmup: JIT, codegen, footers
    spark.sharedState.cacheManager.clearCache()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (record) println(s"[job ${j.jobId}] ${j.stageIds.size} stages")
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          val tm = si.taskMetrics
          val dur = for {
            c <- si.completionTime; s <- si.submissionTime
          } yield c - s
          println(f"[stage ${si.stageId}%3d] ${dur.getOrElse(-1L)}%6d ms  " +
            f"${si.numTasks}%3d tasks  " +
            f"shR ${tm.shuffleReadMetrics.totalBytesRead >> 20}%4d MB  " +
            f"shW ${tm.shuffleWriteMetrics.bytesWritten >> 20}%4d MB  " +
            f"in ${tm.inputMetrics.bytesRead >> 20}%4d MB  ${si.name}")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    record = true
    val t0 = System.nanoTime()
    val n = q(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    catch { case _: Throwable => () }
    println(f"[probe] $name: $sec%.3f s ($n rows)")
    spark.stop()
  }
}
