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
    * table is already registered in this session with matching row
    * count, the write is skipped — that IS the operator's contract (pay
    * the layout shuffle once, join forever); rewriting per query would
    * charge every consumer the one-time cost. A count mismatch (or a
    * missing/unregistered path) rebuilds from scratch: drop + dir wipe
    * first, so stale files from a dead session can't mix generations. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = spark.catalog.tableExists(table) && fs.exists(p) &&
      (try spark.table(table).count() == df.count()
       catch { case _: Throwable => false })
    if (!current) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      fs.delete(p, true)
      df.write.format("parquet").mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path).saveAsTable(table)
    }
  }
}
