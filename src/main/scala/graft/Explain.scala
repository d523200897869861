package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for every registered
  * query so broadcast choices, pushed filters, and whole-stage-codegen
  * spans can be reviewed (`sbt "runMain graft.Explain <sfDir> <outFile>"`).
  * Queries with side effects (load protocol, streaming) explain their
  * final read, which is what the plan review cares about anyway.
  *
  * Runs with [[graft.ops.Checkpoints]] explain mode ON (r18):
  * lineage truncation becomes identity, so the iterative builds'
  * per-round construction plans (the former PLAN_AUDIT `†` blind
  * spot) print in full instead of stopping at the last checkpoint.
  * Execution that happens while constructing the DataFrames (eager
  * codebook training, fixture ensure()) tolerates the untruncated
  * lineage at audit scale (sf0.001).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/graft_plans.txt"
    graft.ops.Checkpoints.enableExplainMode()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.registry.foreach { q =>
      sb.append(s"\n${"=" * 78}\n== ${q.name}\n${"=" * 78}\n")
      try {
        val df = q.run(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => sb.append(s"EXPLAIN FAILED: ${e.getMessage}\n")
      }
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
