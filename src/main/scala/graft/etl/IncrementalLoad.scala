package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The incremental (CDC delete-insert, staging-swap) load protocol — the
  * reference's script skeleton (ref `Incremental_load_fact_item_status
  * .sql:1-342`; SURVEY.md §2.8 C1-C5, §2.1 S4-S8/S10, §3 E2).
  *
  * Statement-by-statement mapping:
  *  - delta offset scalar with IFNULL fallback (P6/A1)      ref :10-20
  *  - staging "clone" of the target (S5)                    ref :23-26
  *    — raw parquet has no metadata-only clone; we stage the next
  *    snapshot in a sibling directory and atomically rename (SURVEY
  *    §7.4.3; atomicity is directory-rename-level, not transactional)
  *  - TRUNCATE on FULL_LOAD / lookback DELETE on delta (S6/S7, C3)
  *    — delete = filter-and-keep with the reference's STRICT `>` while
  *    the insert filter uses `>=` (comparators preserved verbatim,
  *    SURVEY §7.4.5)                                        ref :29-34
  *  - INSERT … SELECT of the fresh branch union (S4)        ref :40-314
  *  - @@row_count capture of deleted/inserted (A4/C4)       ref :37,317
  *  - staging → target publish + DROP staging (S5/S8)       ref :321-328
  *  - audit row append (S10, C5)                            ref :331-341
  *
  * `current_timestamp()` (ref :6) is a constructor param for determinism
  * (SURVEY §7.4.2).
  *
  * Scale: the protocol touches the target twice (max-scan for the offset,
  * filter-scan for kept rows) — both prune to the CDC column / lookback
  * window when the target is date-partitioned, so a delta run's cost is
  * O(lookback + fresh), never O(history). The staged write keeps the swap
  * atomic and the old snapshot readable until publish.
  */
object IncrementalLoad {

  /** The ten Jinja params of the reference (C6, ref sql:8-20) reduced to
    * what the engine needs; path params replace project/dataset ids. */
  final case class Params(
      loadType: String, // "FULL_LOAD" | anything else = delta (ref :13-18,29)
      minimumDate: String, // {{params.minimum_date}} fallback (ref :15,17)
      deltaDayCount: Int, // {{params.delta_day_count}} lookback (ref :17)
      targetPath: String,
      auditPath: String,
      tableName: String = "fact_item_status", // logical name for the audit row
      dagName: String = "graft_fact_item_status",
      startTimestamp: String = "1970-01-01 00:00:00") // ref :6 surrogate

  final case class Result(offset: String, deleted: Long, inserted: Long)

  val auditSchema: StructType = StructType(Seq(
    StructField("dag_name", StringType),
    StructField("table_name", StringType),
    StructField("layer", StringType),
    StructField("load_type", StringType),
    StructField("load_start", StringType),
    StructField("inserted_count", LongType),
    StructField("deleted_count", LongType),
    StructField("key_expr", StringType)))

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) Some(spark.read.parquet(path)) else None
  }

  /** One load run. `fresh` builds the branch-union for a given offset
    * string (the INSERT…SELECT, ref :40-314); `cdcCol` is the CDC
    * timestamp column of the fact. */
  def run(spark: SparkSession, params: Params,
      fresh: String => DataFrame, cdcCol: String): Result = {
    val target = readIfExists(spark, params.targetPath)

    // offset scalar (ref :10-20): FULL_LOAD → minimum_date; delta →
    // IFNULL(date_sub(MAX(cdc), lookback), minimum_date).
    val offset: String =
      if (params.loadType == "FULL_LOAD" || target.isEmpty) params.minimumDate
      else {
        // date_format renders in the UTC session zone with full micros, so
        // the string round-trips losslessly through the later cast.
        val row = target.get.agg(date_format(
          max(col(cdcCol)) - expr(s"INTERVAL ${params.deltaDayCount} DAYS"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS")).first()
        if (row.isNullAt(0)) params.minimumDate else row.getString(0)
      }

    // TRUNCATE vs lookback DELETE (ref :29-34): strict `>` per §7.4.5.
    val kept: Option[DataFrame] =
      if (params.loadType == "FULL_LOAD") None
      else target.map(_.filter(col(cdcCol) <= lit(offset).cast("timestamp")))
    val targetCount = target.map(_.count()).getOrElse(0L)
    val keptCount = kept.map(_.count()).getOrElse(0L)
    val deleted = targetCount - keptCount // @@row_count (ref :37)

    // INSERT … SELECT (ref :40-314): branch union at `>=` offset.
    val freshDf = fresh(offset)
    val inserted = freshDf.count() // @@row_count (ref :317)

    // staged write + atomic publish (ref :23-26, :321-328): write the next
    // snapshot beside the target, then rename over it. The staging read of
    // `kept` happens before the old snapshot is dropped.
    val staging = params.targetPath + "__staging"
    val next = kept.map(_.unionByName(freshDf)).getOrElse(freshDf)
    next.write.mode("overwrite").parquet(staging)

    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val targetP = new Path(params.targetPath)
    if (fs.exists(targetP)) fs.delete(targetP, true)
    fs.rename(new Path(staging), targetP) // publish; staging gone (S8)

    // audit append (ref :331-341).
    val auditRow = org.apache.spark.sql.Row(params.dagName, params.tableName,
      "DW_FACT", params.loadType, params.startTimestamp, inserted, deleted,
      "concat(fact_item_status_key, line_item_status, latest_status, " +
        "trans_order_id, cart_id)")
    spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](auditRow), auditSchema)
      .write.mode("append").parquet(params.auditPath)

    Result(offset, deleted, inserted)
  }
}
