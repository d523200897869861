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
  *    — the reference's zero-copy CLONE + delete/insert + swap exists so
  *    a delta run never rewrites history ("This COPY process is fast",
  *    ref :22,319). The file-level analog is a DATE-PARTITIONED target
  *    (`cdc_day=YYYY-MM-DD/`) plus dynamic partition overwrite: a delta
  *    run rewrites ONLY the lookback-window partitions; all older
  *    partitions are untouched bytes on disk — O(lookback + fresh),
  *    never O(history). FULL_LOAD still stages a complete snapshot in a
  *    sibling directory and atomically renames (SURVEY §7.4.3).
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
  * Scale ledger (delta run, date-partitioned target):
  *  - offset max-scan prunes to the single lexicographically-latest
  *    `cdc_day=` partition (directory listing picks the day), and the
  *    pruned MAX itself folds from that partition's parquet FOOTER
  *    stats when provably exact (ops/MetadataMax) — zero jobs; INT96
  *    or missing stats fall back to scanning just that partition;
  *  - the deleted @@row_count is ONE conditional aggregate over the
  *    lookback partitions only (no full-target count, no second scan);
  *  - the publish rewrites only partitions with `cdc_day >= date(offset)`
  *    via a per-partition staged swap (rename-aside, rename-in); the
  *    NULL-cdc partition is merged, never replaced.
  */
object IncrementalLoad {

  /** Physical partition column of the managed fact (derived, dropped on
    * logical reads). Day granularity matches the reference's day-unit
    * lookback (`delta_day_count`, ref :17). */
  val partCol = "cdc_day"

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

  /** FileSystem of `path`'s own scheme (never the default FS — a target
    * on s3a:// or hdfs:// must resolve to its own filesystem). */
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Publish marker inside a completed staging dir: written ONLY after
    * the staged parquet write finished, so its presence certifies the
    * staging is a complete, publishable unit. Content is the publish
    * mode ("FULL" | "DELTA <offset-day>") — everything recovery needs
    * to re-run the publish tail after a crash. */
  val markerName = "_graft_publish"

  private[graft] def writeMarker(fs: FileSystem, staging: Path,
      content: String): Unit =
    graft.ops.CertFile.write(fs, new Path(staging, markerName), content)

  private[graft] def readMarker(fs: FileSystem, staging: Path): Option[String] =
    graft.ops.CertFile.read(fs, new Path(staging, markerName))

  /** FULL publish tail: retire the old target, promote the staged
    * snapshot, drop the retired copy. Idempotent given a complete
    * staging — rerunnable from any crash point (every byte is always
    * under exactly one of target / __retired / __staging). */
  private[graft] def publishFull(fs: FileSystem, targetP: Path,
      staging: Path): Unit = {
    val retired = new Path(targetP.toString + "__retired")
    fs.delete(retired, true)
    if (fs.exists(targetP)) fs.rename(targetP, retired)
    fs.rename(staging, targetP) // publish; staging gone (S8)
    // the marker rode the rename into the target — it certified the
    // STAGING, so drop it now that the publish is the commit
    fs.delete(new Path(targetP, markerName), false)
    fs.delete(retired, true)
  }

  /** DELTA publish tail: per-partition staged swap + emptied-partition
    * cleanup + staging drop. Idempotent given a complete staging and
    * the RECORDED staged-partition set (from the marker): partitions
    * already moved out of staging by a crashed attempt are skipped
    * (no longer listed), but the cleanup still honors the full
    * original set — re-listing staging on recovery would otherwise
    * mistake moved partitions for emptied ones and delete them. */
  private[graft] def publishDelta(fs: FileSystem, targetP: Path,
      staging: Path, offsetDayStr: String,
      recordedParts: Set[String]): Unit = {
    val nullPart = partCol + "=__HIVE_DEFAULT_PARTITION__"
    val present = fs.listStatus(staging).iterator
      .map(_.getPath.getName).filter(_.startsWith(partCol + "=")).toSet
    present.foreach { name =>
      val src = new Path(staging, name)
      val dest = new Path(targetP, name)
      if (name == nullPart && fs.exists(dest)) {
        fs.listStatus(src).iterator
          .filterNot(_.getPath.getName.startsWith("_"))
          .foreach(f => fs.rename(f.getPath, new Path(dest, f.getPath.getName)))
        fs.delete(src, true)
      } else {
        val retire = new Path(targetP, "." + name + ".retire")
        fs.delete(retire, true)
        if (fs.exists(dest)) fs.rename(dest, retire)
        fs.rename(src, dest)
        fs.delete(retire, true)
      }
    }
    // DELETE-scope partitions whose rows were all deleted with no
    // fresh replacement — removed only now, after the publish.
    if (fs.exists(targetP)) fs.listStatus(targetP).foreach { st =>
      val name = st.getPath.getName
      if (name.matches(partCol + "=\\d{4}-\\d{2}-\\d{2}") &&
          name.stripPrefix(partCol + "=") >= offsetDayStr &&
          !recordedParts.contains(name))
        fs.delete(st.getPath, true)
    }
    fs.delete(staging, true) // DROP staging (S8)
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    if (fsFor(spark, path).exists(new Path(path))) Some(spark.read.parquet(path))
    else None
  }

  /** Logical view of the managed target: physical layout (the partition
    * column) stripped. All readers outside the protocol go through here. */
  def readTarget(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(partCol)

  /** Latest `cdc_day=` partition value by directory listing — the pruned
    * entry point for the offset max-scan. Day strings are yyyy-MM-dd, so
    * lexicographic max == date max. None when no dated partition exists. */
  private def latestDay(spark: SparkSession, path: String): Option[String] = {
    val fs = fsFor(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(partCol + "="))
      .map(_.stripPrefix(partCol + "="))
      .filter(_ != "__HIVE_DEFAULT_PARTITION__")
      .reduceOption((a, b) => if (a >= b) a else b)
  }

  /** One load run. `fresh` builds the branch-union for a given offset
    * string (the INSERT…SELECT, ref :40-314); `cdcCol` is the CDC
    * timestamp column of the fact. */
  def run(spark: SparkSession, params: Params,
      fresh: String => DataFrame, cdcCol: String): Result = {
    // Self-healing entry: a rerun after a crashed publish must not
    // compute its offset from (or stage over) a half-swapped target —
    // roll the previous attempt forward or back FIRST. No-op (and
    // cheap: a directory listing) on healthy targets.
    graft.ops.Recovery.recoverIncrementalTarget(spark, params.targetPath)
    val target = readIfExists(spark, params.targetPath)

    // offset scalar (ref :10-20): FULL_LOAD → minimum_date; delta →
    // IFNULL(date_sub(MAX(cdc), lookback), minimum_date). MAX(cdc) lives
    // in the latest day partition by construction — scan only it.
    val offset: String =
      if (params.loadType == "FULL_LOAD" || target.isEmpty) params.minimumDate
      else {
        val pruned = latestDay(spark, params.targetPath) match {
          case Some(d) => target.get.filter(col(partCol) === lit(d))
          case None => target.get
        }
        // date_format renders in the UTC session zone with full micros, so
        // the string round-trips losslessly through the later cast.
        val aggDf = pruned.agg(date_format(
          max(col(cdcCol)) - expr(s"INTERVAL ${params.deltaDayCount} DAYS"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        // answer the pruned MAX from the partition's parquet footers
        // when provably exact (ops/MetadataMax: the same fold the
        // script front door uses) — zero jobs; refusal (e.g. INT96
        // encodings) falls back to the one-partition scan
        val row = graft.ops.MetadataMax
          .rewrite(spark, aggDf.queryExecution.optimizedPlan)
          .flatMap(graft.ops.MetadataMax.evalFolded)
          .getOrElse(aggDf.first())
        if (row.isNullAt(0)) params.minimumDate else row.getString(0)
      }
    val offsetTs = lit(offset).cast("timestamp")
    val offsetDay = to_date(offsetTs)

    // TRUNCATE vs lookback DELETE (ref :29-34): strict `>` per §7.4.5.
    // Both the deleted @@row_count (ref :37) and the kept survivors come
    // from the lookback partitions alone (cdc_day >= date(offset) — every
    // row with cdc > offset lives there); one pruned conditional aggregate
    // replaces the former full-target count + kept count pair.
    val fullLoad = params.loadType == "FULL_LOAD"
    val lookback: Option[DataFrame] =
      if (fullLoad) None
      else target.map(_.filter(col(partCol) >= offsetDay))
    val deleted: Long =
      if (fullLoad) target.map(_.count()).getOrElse(0L)
      else lookback.map(_.agg(
          count(when(col(cdcCol) > offsetTs, 1)).as("d"))
        .first().getLong(0)).getOrElse(0L)
    val kept: Option[DataFrame] =
      lookback.map(_.filter(col(cdcCol) <= offsetTs).drop(partCol))

    // INSERT … SELECT (ref :40-314): branch union at `>=` offset.
    // The @@row_count (ref :317) is collected DURING the staged write
    // via CollectMetrics (`observe`) — the branch union (the most
    // expensive dataflow of the protocol: 16 scans, 15 joins, 3 wide
    // distincts) executes exactly ONCE; the former `freshDf.count()`
    // was a full second execution of it.
    val insertedObs = new org.apache.spark.sql.Observation("graft_inserted")
    val freshDf = fresh(offset)
      .observe(insertedObs, count(lit(1)).as("inserted"))

    val next = kept.map(_.unionByName(freshDf)).getOrElse(freshDf)
      .withColumn(partCol, to_date(col(cdcCol)))

    val fs = fsFor(spark, params.targetPath)
    val targetP = new Path(params.targetPath)
    val staging = new Path(params.targetPath + "__staging")
    if (fullLoad || target.isEmpty) {
      // staged write + snapshot publish (ref :23-26, :321-328): full
      // snapshot beside the target; the old target is renamed ASIDE
      // (not deleted) before the staged snapshot renames in, so every
      // byte is always under exactly one of target / __retired /
      // __staging — a crash strands data in a sibling dir, never loses
      // it. Recovery = graft.ops.Recovery.recoverIncrementalTarget:
      // the post-write publish marker makes the crash state
      // machine-decidable (marker present ⇒ staging complete ⇒ re-run
      // this publish tail; absent ⇒ write died ⇒ drop staging).
      next.write.partitionBy(partCol).mode("overwrite")
        .parquet(staging.toString)
      writeMarker(fs, staging, "FULL")
      publishFull(fs, targetP, staging)
    } else {
      // Delta publish — per-partition staged swap: stage kept∪fresh
      // (all rows have cdc_day >= date(offset)), then swap each staged
      // partition over its target directory ONE PARTITION AT A TIME:
      // rename the old dir aside to a dot-prefixed retire name (hidden
      // from Spark/Hadoop readers), rename the staged dir in, drop the
      // retire dir. History partitions (< date(offset)) are never
      // opened, matching the reference's cheap-clone intent (ref
      // :22,319). Emptied lookback partitions (all rows deleted, no
      // fresh replacement) are dropped LAST, after all new data is in
      // place.
      //
      // Atomicity contract: each partition's swap is two renames — a
      // concurrent reader can observe that ONE partition momentarily
      // absent, and different partitions swap at different instants
      // (cross-partition consistency is not promised mid-publish; the
      // reference's own delete-then-insert window, ref :29-317, is
      // strictly wider). No crash point loses data: every partition's
      // bytes live in exactly one of target/P, target/.P.retire, or
      // __staging/P. Recovery = graft.ops.Recovery
      // .recoverIncrementalTarget: the marker (mode + offset day,
      // written only after the staged write completed) lets it re-run
      // this exact publish tail idempotently.
      //
      // The NULL partition (__HIVE_DEFAULT_PARTITION__) is special: its
      // rows never satisfy the reference's `cdc > offset` delete
      // predicate (NULL comparisons are false), so its history must be
      // KEPT — staged fresh null-cdc files are MERGED into the existing
      // directory (per-file renames; part-file names are UUID-unique)
      // instead of replacing it.
      next.write.partitionBy(partCol).mode("overwrite")
        .parquet(staging.toString)
      val offsetDayStr = offset.take(10) // yyyy-MM-dd sorts like dates
      val stagedNames = fs.listStatus(staging).iterator
        .map(_.getPath.getName).filter(_.startsWith(partCol + "=")).toSet
      writeMarker(fs, staging,
        (s"DELTA $offsetDayStr" +: stagedNames.toSeq.sorted).mkString("\n"))
      publishDelta(fs, targetP, staging, offsetDayStr, stagedNames)
    }

    // The staged write is the one action over `next`; the observation
    // resolved with it (blocks until the write's QueryExecution fires
    // its listener — already done by the time the rename-publish ran).
    val inserted: Long = insertedObs.get("inserted") match {
      case n: java.lang.Long => n.longValue()
      case n: java.lang.Number => n.longValue()
    }

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
