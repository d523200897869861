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
    // per-batch durationMs terms, summed across the iter's batches —
    // the compact floor decomposition (planning vs WAL/offset-log I/O
    // vs state commit vs addBatch work); prettyJson stays for detail
    val sums = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val started = new java.util.concurrent.atomic.AtomicLong(0)
    val terminated = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {
        started.incrementAndGet()
        println(s"[probe] started ${e.id} at ${e.timestamp}")
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        e.progress.durationMs.forEach((k, v) =>
          sums.merge(k, v.longValue(), (a, b) => a + b))
        println(s"[probe] progress ${e.progress.prettyJson}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
        terminated.incrementAndGet()
        println(s"[probe] terminated ${e.id}")
      }
    })
    val q = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      sums.clear(); batches.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events land asynchronously — but the bus delivers
      // them in order per listener, so once every started query's
      // TERMINATED event has arrived, all of its progress events have
      // too. Latch on that (r16 ADVICE: a fixed sleep silently
      // under-counts the durationMs terms the floor decomposition is
      // built on) and WARN if the latch times out.
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (terminated.get() < started.get() &&
          System.nanoTime() < deadline) Thread.sleep(20)
      if (terminated.get() < started.get())
        System.err.println(s"[probe] WARN: only ${terminated.get()} of " +
          s"${started.get()} started queries reported terminated within " +
          "10 s — durationMs sums below may be incomplete")
      val terms = {
        import scala.jdk.CollectionConverters._
        sums.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => f"$k=${v / 1000.0}%.3fs" }.mkString(" ")
      }
      println(f"[probe] $name iter $i: $wall%.3f s ($n rows), " +
        f"batches=${batches.get()}, terms: $terms")
    }
    spark.stop()
  }
}
