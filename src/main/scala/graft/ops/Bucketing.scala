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
    * as `table` in the session catalog, replacing any previous version
    * (drop + dir wipe first, so reruns and stale files from a dead
    * session can't mix generations). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path).saveAsTable(table)
  }
}
