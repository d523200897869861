package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg (dev loop only): comma-separated query ids or
    // full names — exact match, so "q12" does NOT also select q120-q129
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    def selected(name: String): Boolean =
      only.forall(_.exists(s => name == s || name.startsWith(s + "_")))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Verify keeps the INT96 default ON PURPOSE: the DuckDB compare
      // types adjusted-to-UTC INT64 micros as TIMESTAMPTZ while every
      // oracle computes naive TIMESTAMP — same instants, failed
      // schema/hash compare (14 queries red when this was flipped).
      // Bench + tests write TIMESTAMP_MICROS and exercise the footer
      // prune (ops/MetadataMax); under Verify the prune refuses INT96
      // and falls back to the scan — identical results either way.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Shared BPE tokenization fixture: materialized ONCE per run at a
    // fixed path so the BPE-family oracles read it instead of each
    // replaying the full merge table (seconds per query in DuckDB).
    // Anchored by q162_bpe_table, whose oracle replays the table in
    // full and hash-compares against this exact content.
    try graft.ops.Bpe.docTokensDf(
      graft.tables.Catalog.documents(spark, sfDir))
      .coalesce(1).write.mode("overwrite")
      .parquet(graft.ops.Bpe.dtFixturePath)
    catch { case e: Throwable =>
      System.err.println(s"[verify] bpe fixture failed: ${e.getMessage}")
    }
    // Stored-graph ORACLE MIRRORS (q165/q166/q168/q170/q175 oracles read
    // these instead of replaying construction; q211 is the content
    // anchor — see SimilarityQueries' fixture section).
    try graft.queries.SimilarityQueries.oracleGraphFixtures(spark, sfDir)
      .foreach { case (path, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(path)
      }
    catch { case e: Throwable =>
      System.err.println(s"[verify] graph fixtures failed: ${e.getMessage}")
    }
    SparkEntry.queries.filter(t => selected(t._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(t => selected(t._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Pure-DuckDB recipe for the BPE fixture (path -> replay SELECT):
    // lets tools/bench_oracle.py rebuild it independently when timing
    // oracles at a different scale factor than this run's sfDir.
    val fixtures = Map(
      graft.ops.Bpe.dtFixturePath ->
        graft.ops.Bpe.dtReplaySql(graft.queries.TextQueries.normSql),
      graft.queries.SimilarityQueries.knnRefFixturePath ->
        graft.queries.SimilarityQueries.knnRefReplaySql,
      graft.queries.SimilarityQueries.knnRefhFixturePath ->
        graft.queries.SimilarityQueries.knnRefhReplaySql,
      graft.queries.SimilarityQueries.knnRefx1FixturePath ->
        graft.queries.SimilarityQueries.knnRefx1ReplaySql,
      graft.queries.SimilarityQueries.knnDup168FixturePath ->
        graft.queries.SimilarityQueries.knnDup168ReplaySql)
    Files.writeString(Paths.get(s"$outDir/fixture_sql.json"),
      fixtures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
