package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: run one registered STREAMING query with a progress
  * listener attached, dumping each micro-batch's duration breakdown
  * (addBatch / getBatch / walCommit / queryPlanning / commitOffsets)
  * and state-store operator metrics — the attribution a wall-clock
  * bench number can't give. Usage:
  *
  *   sbt "runMain graft.StreamProbe <queryName> [sfDir] [iters]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 1
    val spark = Bench.session()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.id} at ${e.timestamp}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[probe] progress ${e.progress.prettyJson}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] terminated ${e.id}")
    })
    val q = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[probe] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
