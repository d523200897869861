package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // PER-PROCESS RAM scratch with dead-owner reaping (ops/Scratch):
    // bounds tmpfs accumulation across crashed runs without wiping a
    // concurrently running session's live checkpoints (StageProbe /
    // StreamProbe / a second bench share this root on this box).
    val scratch = graft.ops.Scratch.sessionScratch()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // static shuffle width; SPARK_GRAFT_SHUFFLE_PARTITIONS is the
      // write-side A/B lever (AQE coalesces the READ side of tiny
      // exchanges, but map tasks still write `this many` buckets —
      // r11 VERDICT #7 asked what the 154 sub-second dataflows pay
      // for the 32-way default)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      // ephemeral protocol scratch (stream checkpoints, staged sources)
      // on RAM when the box has it: a local-mode bench's checkpoint
      // fsyncs measure the disk, not the operator — see ops/Scratch
      .config(graft.ops.Scratch.confKey, scratch)
      // let AQE (incl. partition coalescing) run INSIDE cached-plan
      // builds: Spark ships this false for plan-stability compat, which
      // pins every persisted relation to the static shuffle width — 32
      // near-empty partitions per tiny cache, re-paid by every consumer
      // stage. Full-registry A/B (r11, same box, back-to-back):
      // 122.5s on vs 142.0s off; 3 queries regressed >0.2s vs ~40
      // improved. Semantics unaffected (partitioning only).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // write timestamps as INT64 MICROS, not the stats-less INT96
      // default: lossless (Catalyst IS micros) and it gives every
      // written fact footer min/max on its event-time column — the
      // prune ops/MetadataMax and any table-format reader need
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    // generic A/B lever: "k=v;k=v" extra RUNTIME confs (PERF.md
    // attribution runs — e.g. codegen off to price a cold plan's JIT)
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Per-query diagnostics harvested from the timed run (best-effort):
    * shuffle bytes written by the returned plan, driver-JVM GC delta
    * across the query's runs. In local mode the "driver" GC is the
    * whole JVM, executors included — exactly the noise signal a
    * container-inflation episode needs. */
  final case class RunStats(shuffleMb: Long, gcMs: Long)

  /** The ONE parseable line the driver ingests (it keeps only the last
    * ~2000 chars of stdout). At 149+ queries a full qNN→seconds object
    * no longer fits, so the line is layered (BenchLineSpec pins the
    * rendered size):
    *  - "queries": ONLY the heavy hitters (≥0.95 s, top 20 by time) at
    *    the r1–r6 rendering — the entries a round-over-round comparison
    *    actually tabulates, kept name-keyed for continuity;
    *  - "qcs": EVERY query's time as integer centiseconds, one
    *    comma-separated string, in name-sorted registry order (the same
    *    order CORRECTNESS files list) — full fidelity at ~4 bytes/query;
    *  - "top": the 5 most expensive queries' diagnostics
    *    {cs, shuffle MB, GC ms} so a container-noise episode is
    *    diagnosable from the driver artifact alone (VERDICT r6 #8).
    * The DETAIL stdout line above it keeps full names + ms precision
    * for humans. */
  /** Recorded DuckDB-oracle yardstick (ORACLE_BENCH.json, written by
    * tools/bench_oracle.py): the sum of oracle seconds over exactly
    * the TIMED query names (plus the shared `_fixture:` rebuild
    * entries the BPE oracles amortize into), so the spark-vs-oracle
    * ratio is computable from the driver's bench artifact alone
    * (VERDICT r8 #1). None when the file is absent or records a
    * different scale factor than this run's. */
  private[graft] def oracleTimedSec(timedNames: Seq[String], sfDir: String,
      dir: String = ".", includeFixtures: Boolean = true): Option[Double] = {
    try {
      val p = java.nio.file.Paths.get(dir, "ORACLE_BENCH.json")
      if (!java.nio.file.Files.exists(p)) return None
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val sfRec = """"sf":\s*"([^"]+)"""".r.findFirstMatchIn(text)
        .map(_.group(1)).getOrElse("")
      if (new java.io.File(sfDir).getName != new java.io.File(sfRec).getName)
        return None
      val entries = """"((?:q|_fixture:)[^"]+)":\s*(-?[0-9.]+)""".r
        .findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      val wanted = timedNames.toSet
      val sum = entries.collect {
        case (n, v) if v > 0 &&
          ((includeFixtures && n.startsWith("_fixture:")) || wanted(n)) => v
      }.sum
      if (sum > 0) Some(sum) else None
    } catch { case _: Throwable => None }
  }

  def compactLine(results: Seq[(String, Double)], sfDir: String,
      stats: Map[String, RunStats] = Map.empty,
      trailing: Map[String, Double] = Map.empty,
      canary: Seq[Double] = Nil,
      primeSec: Option[Double] = None): String = {
    def trim(s: String): String =
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    def rq(v: Double): String = trim(
      BigDecimal(v).setScale(if (v < 1) 2 else 1,
        BigDecimal.RoundingMode.HALF_UP).toString)
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def cs(v: Double): String = math.round(v * 100).toString
    // top-6 (8 through r14, 10 through r12, 15 through r11, 20 through
    // r9): at a 220-query registry the line must stay under the
    // driver's ~2000-byte stdout tail; qcs keeps full per-query
    // fidelity regardless
    val heavy = results.filter(_._2 >= 0.95).sortBy(-_._2).take(6)
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + rq(v) }
      .mkString("{", ",", "}")
    val qcs = results.map { case (_, v) => cs(v) }.mkString(",")
    val top = results.sortBy(-_._2).take(4).map { case (k, v) =>
      val st = stats.getOrElse(k, RunStats(0L, 0L))
      "\"" + k.takeWhile(_ != '_') +
        s"""":{"cs":${cs(v)},"shmb":${st.shuffleMb},"gc":${st.gcMs}}"""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // SELF-DIAGNOSING noise flags (VERDICT r7 #8): a query >2× its
    // trailing per-round median, with no code able to change between
    // the rounds a bench run compares (the registry is versioned with
    // the bench), reads as container inflation, not regression — the
    // shuffle-MB diagnostic in "top" lets a reader confirm the work
    // itself was flat. Sub-100ms medians are skipped (pure jitter).
    val env = results.flatMap { case (k, v) =>
      trailing.get(k).filter(m => m >= 0.10 && v > 2 * m)
        .map(m => k -> BigDecimal(v / m).setScale(1,
          BigDecimal.RoundingMode.HALF_UP))
    }.sortBy(-_._2).take(5)
      .map { case (k, x) => "\"" + k.takeWhile(_ != '_') + "\":" + x }
      .mkString("{", ",", "}")
    val sfShort = new java.io.File(sfDir).getName
    // Two ratios, because they answer different questions: the overall
    // one includes the side-effecting protocol queries, whose ORACLES
    // do none of the protocol work (a DuckDB oracle verifies the final
    // state declaratively — no staged swaps, no checkpoints, no file
    // copies — so those queries structurally read ~10x); the dataflow
    // ratio compares like with like.
    val oracleField = oracleTimedSec(results.map(_._1), sfDir) match {
      case Some(o) if total > 0 =>
        def ratio(a: Double, b: Double) = BigDecimal(a / b)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val pureNames = results.map(_._1)
          .filterNot(queries.Q.sideEffecting)
        val purePair = for {
          po <- oracleTimedSec(pureNames, sfDir)
          ps = results.filterNot(r => queries.Q.sideEffecting(r._1))
            .map(_._2).sum
          if po > 0 && ps > 0
        } yield s""""dataflow_vs_oracle":${ratio(ps, po)},"""
        s""""oracle_timed_sec":${r3(o)},""" +
          s""""spark_vs_oracle":${ratio(total, o)},""" +
          purePair.getOrElse("")
      case _ => ""
    }
    // PER-CLASS SUBTOTALS (VERDICT r14 #5): the overall/dataflow split
    // hides which attributed class drifted; emit seconds + per-class
    // oracle ratio for dataflow ("df"), protocol ("pr") and streaming
    // ("st") so drift within a class is visible from the artifact
    // alone. `_fixture:` oracle amortization rides only the dataflow
    // class (the fixtures serve dataflow oracles).
    val clsField = {
      val byCls = results.groupBy { case (n, _) => queries.Q.cls(n) }
      Seq("dataflow" -> "df", "protocol" -> "pr", "streaming" -> "st")
        .flatMap { case (c, short) =>
          byCls.get(c).map { rs =>
            val s = rs.map(_._2).sum
            val x = oracleTimedSec(rs.map(_._1), sfDir,
                includeFixtures = c == "dataflow")
              .filter(_ > 0).filter(_ => s > 0)
              .map(o => ",\"x\":" + BigDecimal(s / o).setScale(2,
                BigDecimal.RoundingMode.HALF_UP)).getOrElse("")
            s""""$short":{"s":${rq(s)}$x}"""
          }
        }.mkString("\"cls\":{", ",", "},")
    }
    // NOISE CANARY (VERDICT r11 #6): the same trivial fixed query timed
    // between every ~20 registry queries — its per-window spread
    // quantifies container inflation INSIDE the artifact (a flat canary
    // + a slow query = regression; canary spikes = noise window).
    val canaryField =
      if (canary.isEmpty) ""
      else s""""canary":"${canary.map(cs).mkString(",")}","""
    val primeField =
      primeSec.fold("")(p => s""""prime_sec":${r3(p)},""")
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},""" +
      s"""$oracleField$clsField"queries":$heavy,"qcs":"$qcs","top":$top,"env":$env,""" +
      canaryField + primeField +
      s""""note":"cs: qcs(name-sorted),canary(/20q); q>=.95s; top={cs,shmb,gc}; env=x/med; cls={s,x=/oracle}; oracle=ORACLE_BENCH.json","sf":"$sfShort"}"""
  }

  /** Trailing per-query time medians from prior rounds' driver
    * artifacts in `dir`: each BENCH_rNN.json carries every query's
    * centiseconds ("qcs", in name-sorted registry order) and the
    * matching CORRECTNESS_rNN.json supplies that round's names.
    * Best-effort — any unreadable/odd-shaped round is skipped, and an
    * empty map disables the noise flags entirely. */
  private[graft] def trailingMedians(dir: String = "."): Map[String, Double] = {
    try {
      val files = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty).map(_.getName).toSet
      val rounds = files.flatMap("""BENCH_r(\d+)\.json""".r
        .findFirstMatchIn(_).map(_.group(1)))
        .filter(r => files.contains(s"CORRECTNESS_r$r.json"))
      val perQuery = scala.collection.mutable.Map.empty[String, List[Double]]
      rounds.foreach { r =>
        try {
          val bench = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(dir, s"BENCH_r$r.json")), "UTF-8")
          val corr = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(dir, s"CORRECTNESS_r$r.json")), "UTF-8")
          // unescaped match hits only the driver-parsed JSON, not the
          // \"-escaped copy inside the "tail" transcript string
          val qcs = """"qcs":\s*"([0-9,]*)"""".r
            .findFirstMatchIn(bench).map(_.group(1).split(',').toSeq)
          val names = """"(q[0-9][^"]*)"\s*:\s*\{""".r
            .findAllMatchIn(corr).map(_.group(1)).toSeq.distinct.sorted
          // qcs covers the TIMED set only; the CORRECTNESS file lists
          // the whole registry. When they differ by exactly the
          // current benchExcluded names, align by dropping those —
          // otherwise the round's sizes don't reconcile and it is
          // skipped (best-effort).
          val timedNames =
            names.filterNot(queries.Q.benchExcluded.contains)
          val aligned =
            if (qcs.exists(_.size == names.size)) Some(names)
            else if (qcs.exists(_.size == timedNames.size)) Some(timedNames)
            else None
          for (cs <- qcs; ns <- aligned if cs.size == ns.size) {
            ns.zip(cs).foreach { case (n, c) =>
              perQuery(n) = (c.toDouble / 100.0) :: perQuery.getOrElse(n, Nil)
            }
          }
        } catch { case _: Throwable => () }
      }
      perQuery.map { case (n, vs) =>
        val s = vs.sorted
        n -> s(s.size / 2)
      }.toMap
    } catch { case _: Throwable => Map.empty }
  }

  /** Whole-JVM shuffle-write accounting via stage-completed events —
    * actions like count() build their own QueryExecution, so plan-level
    * SQLMetrics on the returned DataFrame never see the executed run;
    * the listener sees every stage regardless of which plan ran it. */
  private final class ShuffleListener extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** ONE-TIME PRIME of the cold streaming codepaths (VERDICT r11 #1):
    * seven timed streaming queries each re-paid ~3-4 s of identical
    * first-use cost — MicroBatchExecution / IncrementalExecution
    * planning, state-store provider init+commit, FileStreamSource +
    * offset/commit logs, stream-stream join state, and the
    * foreachBatch sink — because the steady-state warmup skips
    * side-effecting queries entirely. This primes those SHARED
    * codepaths once with three minimal AvailableNow runs over a 64-row
    * staged source (stateful agg, stream-stream interval join,
    * flatMapGroupsWithState), so each timed streaming query pays only
    * its own plan's codegen + its own protocol I/O. The prime's cost
    * is itself reported in the bench line ("stream_prime_sec") — it is
    * moved, not hidden. Per-query codegen is NOT primed (plans are
    * unique); this is the JVM/engine warm-up a long-lived cluster
    * session has by definition. */
  private def primeStreaming(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    try {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
      val base = s"${graft.ops.Scratch.dir(spark)}/graft_stream/_prime"
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val rows = spark.range(0, 64)
        .select(col("id"), (col("id") % 3).as("k"))
      rows.filter(col("id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      rows.filter(col("id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      val schema = spark.read.parquet(s"$base/src").schema
      def src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      def sink(df: DataFrame, tag: String): Unit = {
        val q = df.writeStream.trigger(Trigger.AvailableNow())
          .outputMode("update")
          .option("checkpointLocation", s"$base/ckpt_$tag")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$base/out_$tag"); ()
          }.start()
        q.awaitTermination()
      }
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // stateful agg: state store load/commit, update-mode sink
        sink(src.groupBy(col("k")).count(), "agg")
        // stream-stream interval join: the 4-store join state path
        val l = src.select(col("id"),
          timestamp_seconds(col("id")).as("lts"))
          .withWatermark("lts", "10 seconds")
        val r = src.select(col("id").as("rid"),
          timestamp_seconds(col("id")).as("rts"))
          .withWatermark("rts", "10 seconds")
        sink(l.join(r, col("id") === col("rid") &&
          col("rts") >= col("lts") &&
          col("rts") <= col("lts") + expr("INTERVAL 5 SECONDS")), "join")
        // arbitrary state: the flatMapGroupsWithState path
        import spark.implicits._
        sink(src.select(col("k"), col("id")).as[(Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(OutputMode.Update,
            GroupStateTimeout.NoTimeout) {
            (k: Long, it: Iterator[(Long, Long)],
                st: org.apache.spark.sql.streaming.GroupState[Long]) =>
              val mx = it.map(_._2).foldLeft(st.getOption.getOrElse(0L))(
                math.max)
              st.update(mx)
              Iterator.single((k, mx))
          }.toDF("k", "mx"), "fmgws")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    } catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
  }

  private def gcMsNow(): Long = {
    var s = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach(b => s += math.max(b.getCollectionTime, 0L))
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional profiling controls (the driver passes no args):
    //   args(0) = comma-separated query ids ("q21,q41") restricting the
    //   registry; args(1) = forced timed repeat count for EVERY query.
    val wanted: Option[Set[String]] = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
    val forcedRepeats: Option[Int] =
      if (args.length > 1) Some(args(1).toInt) else None
    def selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.forall(w => w.contains(n) || w.contains(n.takeWhile(_ != '_')))
    }.filterNot { case (n, _) =>
      // correctness-only calibration queries (see Q.benchExcluded) stay
      // out of the timed bench unless explicitly requested by name
      wanted.isEmpty && queries.Q.benchExcluded.contains(n)
    }
    val spark = session()
    // STEADY-STATE methodology: one untimed pass first (whole-stage-
    // codegen compilation, JIT, parquet footer reads — the per-query
    // one-time JVM costs), then all cached relations are dropped so
    // each timed run pays its own materializations. Timed numbers
    // therefore measure the queries' data work at a warm JVM — the
    // regime a long-lived cluster runs in — not process bootstrap.
    //
    // Side-effecting queries (streaming checkpoints, staged-swap
    // publishes, file maintenance — Q.sideEffecting) are SKIPPED in
    // the warmup entirely: their run closures execute the protocol
    // eagerly (q12 runs the full load, q26 blocks on the stream,
    // q138 builds the index) before any DataFrame exists, so even
    // "planning-only" warmup would run every heavy protocol twice per
    // bench. Their timed run is the only execution; the few hundred
    // ms of cold codegen it includes is part of the protocol's real
    // cost anyway (dominated by I/O, not codegen).
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.tables.Catalog.tableNames.foreach { t =>
      try graft.tables.Catalog(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    selected.foreach { case (name, fn) =>
      try {
        if (!queries.Q.sideEffecting(name)) { fn(spark, sfDir).count(); () }
      } catch { case _: Throwable => () }
    }
    // one-time streaming-codepath prime (cost reported in the line);
    // skipped when the selection has no streaming query to benefit.
    // SPARK_GRAFT_NO_PRIME=1 disables it — the A/B lever for measuring
    // what the prime is worth on a given box.
    val primeSec =
      if (!sys.env.contains("SPARK_GRAFT_NO_PRIME") &&
          selected.exists(s => queries.Q.sideEffecting(s._1) &&
            s._1.contains("stream")))
        Some(primeStreaming(spark))
      else None
    // Timed pass. clearCache runs before EVERY run, not once: queries
    // persist() and never unpersist, and the CacheManager matches by
    // logical plan, so a later query sharing a plan fragment (e.g. q61
    // reusing q19's signature pipeline) would otherwise read an earlier
    // timed query's materialized cache instead of paying its own.
    // Pure queries report min-of-2 (shared-container scheduling noise
    // rides on top of real cost; the min is the query's warm cost).
    // Side-effecting queries run once — their protocol I/O dominates
    // and is what's being measured. A periodic System.gc() lets
    // Spark's ContextCleaner reap accumulated broadcasts and shuffle
    // files (they are weak-reference-cleaned, and 135 queries' worth
    // of uncollected driver state otherwise taxes the later queries).
    val shuffle = new ShuffleListener
    spark.sparkContext.addSparkListener(shuffle)
    def shuffleNow(): Long = {
      try org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
      catch { case _: Throwable => () }
      shuffle.bytes.get()
    }
    val stats = scala.collection.mutable.Map.empty[String, RunStats]
    // noise canary: a fixed CPU-bound probe (no shuffle, no source)
    // timed before the pass and after every ~20 queries — its series
    // rides the bench line so a reader separates container-inflation
    // windows from real regressions without trailing-median inference
    val canary = scala.collection.mutable.ArrayBuffer.empty[Double]
    def runCanary(): Unit = {
      val t0 = System.nanoTime()
      spark.range(8000000L).selectExpr("sum(id * 7)").collect()
      canary += (System.nanoTime() - t0) / 1e9
    }
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i % 20 == 0) runCanary()
      if (i % 25 == 24) System.gc()
      // pure queries report min-of-3 (the oracle yardstick is a
      // per-query min over 5-8 DuckDB runs; min-of-2 left one noisy
      // run able to double a sub-second query's recorded time)
      val runs = forcedRepeats.getOrElse(
        if (queries.Q.sideEffecting(name)) 1 else 3)
      val gc0 = gcMsNow()
      val sh0 = shuffleNow()
      val t = (1 to runs).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.min
      // deltas cover ALL the query's runs (min-of-2 shuffles twice) —
      // a noise diagnostic, not a per-run measurement
      stats(name) = RunStats((shuffleNow() - sh0) >> 20, gcMsNow() - gc0)
      name -> t
    }
    // Two output lines: "DETAIL ..." carries full names for humans and
    // is deliberately NOT bare JSON; compactLine is the driver's.
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val detail = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"DETAIL $detail")
    println(compactLine(results, sfDir, stats.toMap, trailingMedians(),
      canary.toSeq, primeSec))
    spark.stop()
  }
}
