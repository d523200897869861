package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Storage-bucketed tables: pay the shuffle ONCE at write time, then
  * every equi-join or aggregation keyed on the bucket column reads
  * co-located buckets and plans with NO exchange on either side — the
  * standard layout for a fact table joined daily on the same key at
  * 100 TB (the alternative, re-shuffling both sides per query, is the
  * single largest recurring cost in such pipelines). `sortBy` the same
  * key so sort-merge joins also skip their sorts.
  *
  * Datasource (non-Hive) bucketed parquet tables: bucket id =
  * `Murmur3Hash(key) pmod buckets`, recorded in the table catalog;
  * Spark's planner proves `HashClusteredDistribution` from it.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at `path` registered
    * as `table` in the session catalog. WRITE-ONCE semantics: if the
    * table is registered and the input's row count matches the count
    * SENTINEL recorded at write time, the write is skipped — that IS
    * the operator's contract (pay the layout shuffle once, join
    * forever); rewriting per query would charge every consumer the
    * one-time cost. The sentinel (a `_graft_rows` file beside the data)
    * makes the check one input count — never a target scan — and
    * detects a changed source even across sessions; a mismatch rebuilds
    * from scratch (drop + dir wipe, so stale files from a dead session
    * can't mix generations). Same-count-different-content updates are
    * NOT detected — pass a changed `path` (versioned layout dirs, the
    * standard practice) when the source can mutate in place. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sentinel = new Path(path + "_graft_rows")
    val inputRows = df.count()
    val current = spark.catalog.tableExists(table) && fs.exists(p) &&
      fs.exists(sentinel) && readLong(fs, sentinel).contains(inputRows)
    if (!current) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      fs.delete(p, true)
      fs.delete(sentinel, true)
      df.write.format("parquet").mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path).saveAsTable(table)
      val out = fs.create(sentinel, true)
      try out.write(inputRows.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  private def readLong(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[Long] =
    try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, n, "UTF-8").trim.toLong)
      } finally in.close()
    } catch { case _: Throwable => None }
}
