package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: decompose one registered query's WARM wall-clock into the
  * terms a many-small-jobs iterative build pays — the attribution
  * behind "the residual is the driver floor, not compute or shuffle"
  * (q164/q221's remaining dataflow concentration). Where
  * [[StageProbe]] says which EXCHANGE is slow, this says how much of
  * the wall no exchange accounts for at all:
  *
  *  - **job-covered time**: the union of [job start, job end]
  *    intervals — time with at least one job in flight;
  *  - **inter-job driver gaps**: wall minus covered — analysis,
  *    optimization, AQE re-planning between materializations,
  *    collect post-processing, checkpoint bookkeeping. Pure driver
  *    floor: no task is running anywhere.
  *  - **in-job scheduling floor**: Σ stage wall − ideal compute
  *    (Σ task executorRunTime / cores) — task dispatch/serialization
  *    overhead on near-empty partitions.
  *
  * Each gap above `gapMs` is printed with the callsite of the NEXT
  * job so the driver time has a name. Usage:
  *
  *   sbt "runMain graft.DriverFloorProbe <queryName> [sfDir] [iters]"
  */
object DriverFloorProbe {
  // start/end are written on the listener thread and read on the main
  // thread after the bus drain; volatile gives the read a formal
  // happens-before instead of relying on the drain's side effects
  // (ADVICE r17).
  private final case class Job(id: Int, @volatile var start: Long = 0L,
    @volatile var end: Long = 0L, var site: String = "")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = Bench.session()
    val cores = spark.sparkContext.defaultParallelism
    val q = SparkEntry.queries(name)
    q(spark, sfDir).count() // warmup: JIT, codegen, footers, memos
    @volatile var record = false
    val jobs = new ConcurrentLinkedQueue[Job]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageWall = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          val j = Job(e.jobId, start = e.time,
            site = Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse(""))
          jobs.add(j); byId.put(e.jobId, j)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (record) {
          val j = byId.get(e.jobId)
          if (j != null) j.end = e.time
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          for (c <- si.completionTime; s <- si.submissionTime)
            stageWall.addAndGet(c - s)
          taskTime.addAndGet(si.taskMetrics.executorRunTime)
          stages.incrementAndGet()
          tasks.addAndGet(si.numTasks)
        }
    })
    (1 to iters).foreach { it =>
      spark.sharedState.cacheManager.clearCache()
      // drain BEFORE arming the recorder (ADVICE r17): in-flight
      // warmup/clearCache stage events would otherwise land after
      // record = true and leak into this iteration's counters
      try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
      catch { case _: Throwable => () }
      jobs.clear(); byId.clear()
      stageWall.set(0); taskTime.set(0); stages.set(0); tasks.set(0)
      record = true
      val t0 = System.currentTimeMillis()
      val n = q(spark, sfDir).count()
      val t1 = System.currentTimeMillis()
      try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
      catch { case _: Throwable => () }
      record = false
      val wall = (t1 - t0) / 1000.0
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.filter(j => j.end > 0 && j.start > 0)
        .sortBy(_.start)
      // union of job intervals inside [t0, t1]
      var covered = 0L
      var cursor = t0
      val gaps = Seq.newBuilder[(Long, String)] // (gap ms, next job site)
      js.foreach { j =>
        val s = math.max(j.start, cursor)
        if (j.start > cursor)
          gaps += ((j.start - cursor, s"job ${j.id} ${j.site}"))
        if (j.end > s) covered += j.end - s
        cursor = math.max(cursor, j.end)
      }
      if (t1 > cursor) gaps += ((t1 - cursor, "tail (post-last-job)"))
      val gapTotal = (t1 - t0) - covered
      val ideal = taskTime.get().toDouble / cores
      println(f"[floor] $name iter $it: wall $wall%.3f s, " +
        f"jobs ${js.size}, stages ${stages.get()}, tasks ${tasks.get()}")
      println(f"[floor]   job-covered ${covered / 1000.0}%.3f s | " +
        f"driver gaps ${gapTotal / 1000.0}%.3f s " +
        f"(${100.0 * gapTotal / math.max(t1 - t0, 1)}%.0f%% of wall)")
      println(f"[floor]   stage wall SUM ${stageWall.get() / 1000.0}%.3f s | " +
        f"task time SUM ${taskTime.get() / 1000.0}%.3f s | " +
        f"ideal compute (/$cores cores) ${ideal / 1000.0}%.3f s")
      val top = gaps.result().sortBy(-_._1).take(12)
      top.foreach { case (ms, site) =>
        println(f"[floor]   gap ${ms / 1000.0}%6.3f s before $site")
      }
      println(f"[floor] $name iter $it rows=$n")
    }
    spark.stop()
  }
}
