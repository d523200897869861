package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticsQueries, CorpusQueries, DedupQueries,
  EtlQueries, LoadQueries, MultimodalQueries, Parity, PipelineQueries, Q,
  RelationalQueries, SimilarityQueries, StreamQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented operator query (SURVEY.md §2 inventory). */
  def registry: Seq[Q] =
    Parity.all ++ EtlQueries.all ++ LoadQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      RelationalQueries.all ++ PipelineQueries.all ++ AnalyticsQueries.all ++
      CorpusQueries.all ++ StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 25-column three-branch fact union — the reference's core build
    * (ref Incremental_load_fact_item_status.sql:40-314). */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.q11.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
