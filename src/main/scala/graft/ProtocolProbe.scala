package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.etl.IncrementalLoad
import graft.queries.LoadQueries

/** Dev tool: decompose the PROTOCOL bench class's spark-vs-oracle gap
  * (r15 VERDICT #4) into named, measured terms for its biggest member
  * family — the incremental-load protocol behind q12/q13 and its
  * script-text twins q172/q173. The oracle yardstick times ONE DuckDB
  * SELECT per query; the protocol pays, on top of that same dataflow:
  * staged parquet writes (durability bytes the SELECT never writes),
  * publish renames, marker/audit certification, and a Spark action
  * floor per protocol step. This probe times each run phase and reads
  * the JVM-global Hadoop FileSystem statistics around it, so the gap
  * decomposes into dataflow seconds vs durability seconds with the
  * written-byte evidence attached. Usage:
  *
  *   sbt "runMain graft.ProtocolProbe [sfDir]"
  */
object ProtocolProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Bench.session()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def fsWritten(): Long =
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file") match {
        case null => 0L
        case s => Option(s.getLong("bytesWritten")).map(_.longValue())
          .getOrElse(0L)
      }
    def treeStats(path: String): (Long, Long) = {
      val p = new Path(path)
      if (!fs.exists(p)) return (0L, 0L)
      var files = 0L; var bytes = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) { val f = it.next(); files += 1; bytes += f.getLen }
      (files, bytes)
    }
    def phase[A](tag: String)(body: => A): A = {
      val w0 = fsWritten(); val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = (fsWritten() - w0) / 1e6
      println(f"[proto-phase] $tag%-28s ${secs}%7.3f s  written=${mb}%8.2f MB")
      r
    }

    val base = "/tmp/graft_proto_probe"
    fs.delete(new Path(base), true)
    val p = IncrementalLoad.Params(
      loadType = "FULL_LOAD", minimumDate = LoadQueries.minDate,
      deltaDayCount = LoadQueries.lookbackDays,
      targetPath = s"$base/fact_events", auditPath = s"$base/audit",
      tableName = "fact_events", startTimestamp = LoadQueries.start)

    // steady-state: run the full cycle twice, report the second
    for (round <- 1 to 2) {
      fs.delete(new Path(base), true)
      println(s"[proto-probe] cycle $round (round 1 = JIT warm-up)")
      // the oracle-comparable term: the SAME dataflows, no durability
      phase("dataflow full-load (count)") {
        LoadQueries.eventsFact(spark, sfDir, Some(LoadQueries.t1Cut))(
          LoadQueries.minDate).count()
      }
      phase("protocol FULL_LOAD run") {
        IncrementalLoad.run(spark, p,
          LoadQueries.eventsFact(spark, sfDir, Some(LoadQueries.t1Cut)),
          "cdc_ts")
      }
      val (ff, fb) = treeStats(s"$base/fact_events")
      println(f"[proto-probe] target after FULL: $ff files, ${fb / 1e6}%.2f MB")
      phase("dataflow delta fresh (count)") {
        LoadQueries.eventsFact(spark, sfDir, None)(
          LoadQueries.minDate).count()
      }
      phase("protocol DELTA run") {
        IncrementalLoad.run(spark, p.copy(loadType = "DELTA"),
          LoadQueries.eventsFact(spark, sfDir, None), "cdc_ts")
      }
      val (df2, db2) = treeStats(s"$base/fact_events")
      val (af, ab) = treeStats(s"$base/audit")
      println(f"[proto-probe] target after DELTA: $df2 files, " +
        f"${db2 / 1e6}%.2f MB; audit: $af files, ${ab / 1e6}%.2f MB")
      phase("read-back target (count)") {
        IncrementalLoad.readTarget(spark, s"$base/fact_events").count()
      }
    }
    spark.stop()
  }
}
