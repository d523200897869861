package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.etl.{AggChina, Fact, ItemStatus, Tomford}

/** The fact-build branches as verifiable queries (SURVEY.md §2.3 J1-J15,
  * §2.2 P3-P5, §2.5 D2-D4, §2.6). Each DuckDB oracle mirrors the Spark
  * derivation expression-by-expression over the same parquet tables —
  * the oracle defines the contract.
  */
object EtlQueries {

  // Fixed CDC offsets per source's time domain (P4 delta filters).
  val itemStatusOffset = "1996-01-01"
  val chinaOffset = "2024-01-10"
  val tomfordOffset = "1997-06-01"

  /** forex dimension stand-in (same derivation as Parity.forexSql /
    * graft.etl.Forex.base). */
  private val forexSql =
    """SELECT o_orderpriority AS from_currency,
      |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cal_year,
      |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS cal_month,
      |       max(CAST(o_totalprice AS DECIMAL(18,2))) AS conversion_rate
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  /** latest rate per currency (window argmax — graft.etl.Dims.forexLatest). */
  private val latestSql =
    """SELECT from_currency, CAST(conversion_rate AS DOUBLE) AS conversion_rate
      |FROM (SELECT *, row_number() OVER (PARTITION BY from_currency
      |        ORDER BY cal_year DESC, cal_month DESC, conversion_rate DESC) AS rn
      |      FROM forex)
      |WHERE rn = 1""".stripMargin

  /** config_brand_region stand-in (graft.etl.Dims.configBrandRegion). */
  private val rcbSql =
    """SELECT n_name AS dataset, CAST(n_nationkey AS BIGINT) AS brand_id,
      |       CAST(n_regionkey AS BIGINT) AS country_id,
      |       CASE CAST(n_nationkey % 5 AS INT)
      |         WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM'
      |         WHEN 3 THEN '4-NOT SPECIFIED' ELSE '5-LOW' END AS country_from_curr,
      |       CASE WHEN n_nationkey % 11 = 10 THEN 'NA' ELSE 'A' END AS record_active
      |FROM nation""".stripMargin

  private val istSql =
    """SELECT * FROM (VALUES ('SHIPPED(2)', 10), ('pending01', 20),
      |  ('Returned(9)3', 30), ('CANCELLED 01', 40), ('Error', 50))
      |  v(item_status_name, status_id)""".stripMargin

  /** Branch 1 — ITEM_STATUS (ref sql:60-112). */
  private val b1Sql =
    s"""WITH forex AS ($forexSql),
       |latest AS ($latestSql),
       |rcb AS ($rcbSql),
       |t AS (SELECT o_orderkey, o_custkey, o_orderdate,
       |        CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey % 5 END AS region_id,
       |        CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_custkey % 25 END AS brand_id,
       |        CASE WHEN o_orderstatus = 'P' THEN 'na' ELSE 'A' END AS record_active
       |      FROM orders),
       |a AS (SELECT *, 'NATION_' || CAST(l_suppkey % 25 AS VARCHAR) AS dataset,
       |        CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_shipdate END AS status_date
       |      FROM lineitem WHERE l_shipdate >= TIMESTAMP '$itemStatusOffset')
       |SELECT DISTINCT
       |  CAST(a.l_orderkey AS VARCHAR) || '|' || CAST(a.l_linenumber AS VARCHAR)
       |    || '|' || CAST(a.l_partkey AS VARCHAR) || '|'
       |    || CAST(a.l_suppkey AS VARCHAR) || '|' || a.dataset AS fact_item_status_key,
       |  CASE WHEN rcb.country_id IN (0, 1)
       |       THEN coalesce(a.status_date, t.o_orderdate)
       |       ELSE a.status_date END AS status_date_key,
       |  rcb.country_id AS region_key,
       |  a.l_returnflag || '-' || a.l_linestatus AS item_status_key,
       |  a.l_linestatus AS line_item_status,
       |  a.l_returnflag AS fulfiller_item_status,
       |  CAST(a.l_linenumber AS BIGINT) AS item_status_id,
       |  CAST(CASE WHEN a.l_linestatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS current_status,
       |  rcb.brand_id AS brand_key,
       |  CAST(0 AS BIGINT) AS dc_code,
       |  CAST(a.l_orderkey AS BIGINT) AS trans_order_id,
       |  CAST(t.o_custkey AS BIGINT) AS user_key,
       |  CAST(a.l_orderkey % 1000 AS BIGINT) AS cart_id,
       |  CAST(a.l_partkey AS BIGINT) AS sku_base_id,
       |  coalesce('P-' || CAST(p.p_partkey AS VARCHAR), 'UNKNOWN') AS product_key,
       |  a.l_quantity AS status_quantity,
       |  a.l_extendedprice AS status_applied_amount,
       |  a.l_extendedprice / nullif(CASE WHEN a.l_orderkey % 97 = 0 THEN 0.0
       |    ELSE f.conversion_rate END, 0) AS status_applied_dollar_amount,
       |  a.l_discount AS status_applied_discount,
       |  (a.l_extendedprice * a.l_discount) / nullif(CASE WHEN a.l_orderkey % 97 = 0
       |    THEN 0.0 ELSE f.conversion_rate END, 0) AS status_applied_dollar_discount,
       |  CAST(NULL AS BIGINT) AS cancel_reason_id,
       |  '0' AS store_number,
       |  CASE WHEN a.l_linestatus = 'O' THEN 'Y' ELSE 'N' END AS latest_status,
       |  a.l_shipdate AS cdc_timestamp_gcp,
       |  CAST(CASE WHEN rcb.brand_id % 3 = 0 THEN 1
       |            WHEN rcb.brand_id % 3 = 1 THEN 2 ELSE 3 END AS BIGINT) AS channel_key
       |FROM a
       |JOIN rcb ON rcb.dataset = a.dataset
       |JOIN latest f ON f.from_currency = rcb.country_from_curr
       |JOIN t ON t.o_orderkey = a.l_orderkey
       |      AND (t.region_id IS NULL OR t.region_id = rcb.country_id)
       |      AND (t.brand_id IS NULL OR t.brand_id = rcb.brand_id)
       |      AND upper(t.record_active) <> 'NA'
       |LEFT JOIN part p ON a.l_partkey = p.p_partkey AND p.p_size >= 10""".stripMargin

  /** Branch 2 — AGG_CHINA (ref sql:114-269). */
  private val b2Sql =
    s"""WITH forex AS ($forexSql),
       |asof_d AS (SELECT max(CAST(o_orderdate AS DATE)) AS d FROM orders),
       |cf AS (SELECT CAST(conversion_rate AS DOUBLE) AS conversion_rate
       |       FROM (SELECT from_currency, max(cal_year) AS cal_year, conversion_rate
       |             FROM forex, asof_d
       |             WHERE cal_month = EXTRACT(month FROM d)
       |               AND cal_year % 100 = CAST(strftime(d, '%y') AS BIGINT)
       |             GROUP BY from_currency, conversion_rate)
       |       WHERE from_currency = '1-URGENT'),
       |dedup AS (SELECT DISTINCT user_id, event_type,
       |            strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') || ' 00:00:00' AS status_date_str,
       |            value
       |          FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$chinaOffset'),
       |pr_sa AS (SELECT *,
       |            'Supplier#00000000' || CAST(user_id % 10 AS VARCHAR) AS elc_brand_code,
       |            CASE event_type WHEN 'purchase' THEN 'shipped'
       |              WHEN 'click' THEN 'pending' WHEN 'view' THEN 'returned'
       |              WHEN 'signup' THEN 'cancelled' ELSE 'error' END AS internal_code,
       |            (user_id * 13) % 2000 AS sku
       |          FROM dedup),
       |br AS (SELECT lower(s_name) AS brand_code, CAST(s_suppkey AS BIGINT) AS brand_key
       |       FROM supplier),
       |rcb AS ($rcbSql),
       |ch AS (SELECT * FROM (VALUES ('Click', 1), ('Purchase', 3), ('SignUp', 4),
       |        ('View', 5), ('Phone', 6)) v(channel_name, channel_id)),
       |ist AS ($istSql)
       |SELECT DISTINCT
       |  md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' || status_date_str
       |      || '|' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR))
       |    AS fact_item_status_key,
       |  CAST(status_date_str AS TIMESTAMP) AS status_date_key,
       |  CAST(rg.r_regionkey AS BIGINT) AS region_key,
       |  coalesce('ST-' || CAST(ist.status_id AS VARCHAR), 'ST-NA') AS item_status_key,
       |  internal_code AS line_item_status,
       |  upper(event_type) AS fulfiller_item_status,
       |  CAST(ist.status_id AS BIGINT) AS item_status_id,
       |  CAST(CASE WHEN internal_code = 'shipped' THEN 1 ELSE 0 END AS BIGINT) AS current_status,
       |  br.brand_key AS brand_key,
       |  CAST(0 AS BIGINT) AS dc_code,
       |  CAST(user_id AS BIGINT) AS trans_order_id,
       |  CAST(user_id AS BIGINT) AS user_key,
       |  CAST(99999 AS BIGINT) AS cart_id,
       |  CAST(sku AS BIGINT) AS sku_base_id,
       |  coalesce('P-' || CAST(pt.p_partkey AS VARCHAR), 'UNKNOWN') AS product_key,
       |  CAST(1.0 AS DOUBLE) AS status_quantity,
       |  value AS status_applied_amount,
       |  value / nullif(cf.conversion_rate, 0) AS status_applied_dollar_amount,
       |  CAST(0.0 AS DOUBLE) AS status_applied_discount,
       |  (value * 0.1) / nullif(cf.conversion_rate, 0) AS status_applied_dollar_discount,
       |  CAST(NULL AS BIGINT) AS cancel_reason_id,
       |  '0' AS store_number,
       |  'Y' AS latest_status,
       |  CAST(status_date_str AS TIMESTAMP) AS cdc_timestamp_gcp,
       |  CAST(coalesce(ch.channel_id, 0) AS BIGINT) AS channel_key
       |FROM pr_sa
       |LEFT JOIN cf ON true
       |LEFT JOIN br ON br.brand_code = lower(pr_sa.elc_brand_code)
       |LEFT JOIN part pt ON pt.p_partkey = pr_sa.sku AND pt.p_type = 'STANDARD'
       |LEFT JOIN region rg ON rg.r_regionkey = 2
       |LEFT JOIN rcb ON rcb.brand_id = pr_sa.user_id % 25 AND rcb.country_id = 2
       |             AND rcb.record_active = 'A'
       |LEFT JOIN ch ON upper(ch.channel_name) = upper(pr_sa.event_type)
       |LEFT JOIN ist ON upper(regexp_replace(regexp_replace(ist.item_status_name,
       |    '[0-9]', '', 'g'), '[\\(\\)\\d]+', '', 'g')) = upper(internal_code)
       |WHERE internal_code <> 'error' AND value IS NOT NULL""".stripMargin

  /** Branch 3 — TOMFORD_STATUS (ref sql:271-308). */
  private val b3Sql =
    s"""WITH forex AS ($forexSql),
       |latest AS ($latestSql),
       |rcb AS ($rcbSql),
       |ist AS ($istSql),
       |cr AS (SELECT * FROM (VALUES (0, 'CUSTOMER_REQUEST'), (1, 'OUT_OF_STOCK'),
       |        (2, 'FRAUD'), (3, 'PRICING_ERROR')) v(cancel_code, cancel_reason)),
       |src AS (SELECT *, CASE WHEN o_orderstatus = 'O' THEN 'pending'
       |          WHEN o_orderstatus = 'F' THEN 'shipped' ELSE 'cancelled' END AS status_code
       |        FROM orders WHERE o_orderdate >= TIMESTAMP '$tomfordOffset')
       |SELECT DISTINCT
       |  'TF|' || CAST(o_orderkey AS VARCHAR) AS fact_item_status_key,
       |  o_orderdate AS status_date_key,
       |  rcb.country_id AS region_key,
       |  o_orderstatus || '-TF' AS item_status_key,
       |  status_code AS line_item_status,
       |  o_orderstatus AS fulfiller_item_status,
       |  CAST(ist.status_id AS BIGINT) AS item_status_id,
       |  CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS current_status,
       |  rcb.brand_id AS brand_key,
       |  CAST(CASE WHEN rcb.country_id = 2 AND o_orderstatus = 'F' THEN 7
       |            WHEN rcb.country_id = 2 THEN 3 ELSE 0 END AS BIGINT) AS dc_code,
       |  CAST(o_orderkey AS BIGINT) AS trans_order_id,
       |  CAST(o_custkey AS BIGINT) AS user_key,
       |  CAST(99999 AS BIGINT) AS cart_id,
       |  CAST(o_orderkey % 2000 AS BIGINT) AS sku_base_id,
       |  coalesce('P-' || CAST(pt.p_partkey AS VARCHAR), 'UNKNOWN') AS product_key,
       |  CAST(1.0 AS DOUBLE) AS status_quantity,
       |  o_totalprice AS status_applied_amount,
       |  o_totalprice / nullif(f.conversion_rate, 0) AS status_applied_dollar_amount,
       |  CAST(0.0 AS DOUBLE) AS status_applied_discount,
       |  (o_totalprice * 0.05) / nullif(f.conversion_rate, 0) AS status_applied_dollar_discount,
       |  CAST(o_orderkey % 7 AS BIGINT) AS cancel_reason_id,
       |  '' AS store_number,
       |  CASE WHEN o_orderstatus = 'O' THEN 'Y' ELSE 'N' END AS latest_status,
       |  o_orderdate AS cdc_timestamp_gcp,
       |  CAST(CASE WHEN cr.cancel_reason = 'FRAUD' THEN 9 ELSE 4 END AS BIGINT) AS channel_key
       |FROM src
       |JOIN rcb ON rcb.brand_id = o_custkey % 25 AND rcb.country_id = o_custkey % 5
       |JOIN latest f ON f.from_currency = o_orderpriority
       |LEFT JOIN ist ON upper(regexp_replace(regexp_replace(ist.item_status_name,
       |    '[0-9]', '', 'g'), '[\\(\\)\\d]+', '', 'g')) = upper(status_code)
       |LEFT JOIN part pt ON pt.p_partkey = o_orderkey % 2000
       |LEFT JOIN cr ON cr.cancel_code = o_orderkey % 7""".stripMargin

  // The branch builders' 15-join analysis is per-(session, dataset,
  // SOURCE GENERATION) constant — memoized like q139's parsed
  // statement (see q11's note); re-execution re-optimizes and re-runs,
  // results unchanged. The memo key carries a content stamp of every
  // table the branches read, because the analyzed plan pins the
  // analysis-time file listing (InMemoryFileIndex): in-place testdata
  // regeneration within a session — the round-8 incident class the
  // fixture stamps guard against — must invalidate the entry, not
  // silently read stale part files. Seven listStatus calls per run,
  // driver-side noise next to the 15-join analysis being amortized.
  private val branchTables = Seq(
    "orders", "part", "supplier", "nation", "region", "events", "lineitem")
  private def branchStamp(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    branchTables.map(t =>
      try graft.ops.Fixtures.datasetStamp(s, s"$d/$t.parquet")
      catch { case _: Throwable => s"$t:absent" }).mkString("#")

  // Per-session memo store, WEAKLY keyed on the session: a stopped,
  // dereferenced SparkSession's resolved DataFrames must not be
  // retained for the JVM's lifetime (test suites churn sessions).
  private val memoStore = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession,
    scala.collection.concurrent.TrieMap[(String, String, String),
      org.apache.spark.sql.DataFrame]]()

  private def memoized(s: org.apache.spark.sql.SparkSession, name: String,
      d: String)(build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val m = memoStore.synchronized {
      var cur = memoStore.get(s)
      if (cur == null) {
        cur = scala.collection.concurrent.TrieMap
          .empty[(String, String, String), org.apache.spark.sql.DataFrame]
        memoStore.put(s, cur)
      }
      cur
    }
    val stamp = branchStamp(s, d)
    // a regenerated source must not strand its stale entry either
    m.keySet.filter(k => k._1 == name && k._2 == d && k._3 != stamp)
      .foreach(m.remove)
    m.getOrElseUpdate((name, d, stamp), build)
  }

  private def memoQ(name: String, sql: String)(
      build: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Q =
    Q(name, (s, d) => memoized(s, name, d)(build(s, d)), Some(sql))

  val q08 = memoQ("q08_item_status_branch", b1Sql)(
    ItemStatus.build(_, _, itemStatusOffset))

  val q09 = memoQ("q09_agg_china_branch", b2Sql)(
    AggChina.build(_, _, chinaOffset))

  val q10 = memoQ("q10_tomford_branch", b3Sql)(
    Tomford.build(_, _, tomfordOffset))

  val q11 = {
    // Branch construction + analysis of the three 15-join trees is
    // per-(session, dataset, source generation) CONSTANT — memoized
    // exactly like q139's parsed statement (the session plan-cache
    // behavior both front doors should share). Re-running the memoized
    // frame re-optimizes and re-executes, so the result cannot differ
    // from a fresh build.
    Q("q11_fact_union",
      (s, d) => memoized(s, "q11", d)(
        Fact.build(s, d, itemStatusOffset, chinaOffset, tomfordOffset)),
      Some(s"($b1Sql)\nUNION ALL\n($b2Sql)\nUNION ALL\n($b3Sql)"))
  }

  /** q48 — SCD Type-2 dimension maintenance: two batch snapshots over
    * the supplier dim (batch 2 changes every 3rd supplier's balance and
    * introduces new keys); the final versioned table must carry closed
    * history rows, surviving current rows, new versions, and inserts. */
  val q48 = {
    val t1 = "2024-01-01 00:00:00"
    val t2 = "2024-02-01 00:00:00"
    Q("q48_scd2_dimension",
      (s, d) => {
        val sup = graft.tables.Catalog.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        // New-key shift derived from the data (max key × 10) so synthetic
        // inserts never collide with real keys at any scale factor — a
        // fixed +1000 collides once the table exceeds 1000 rows.
        val shift = sup.agg(max(col("s_suppkey"))).first().getLong(0) * 10
        val b2 = sup.select(col("s_suppkey"), col("s_name"),
          when(col("s_suppkey") % 3 === 0, col("s_acctbal") + 100.0)
            .otherwise(col("s_acctbal")).as("s_acctbal"))
          .unionAll(sup.filter(col("s_suppkey") % 5 === 0)
            .select((col("s_suppkey") + shift).as("s_suppkey"), col("s_name"),
              (col("s_acctbal") * 2).as("s_acctbal")))
        val v1 = graft.etl.Scd2.applyBatch(None, sup,
          Seq("s_suppkey"), Seq("s_name", "s_acctbal"), t1)
        val v2 = graft.etl.Scd2.applyBatch(Some(v1), b2,
          Seq("s_suppkey"), Seq("s_name", "s_acctbal"), t2)
        v2.withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
          .withColumn("valid_to", col("valid_to").cast("timestamp_ntz"))
      },
      Some(
        s"""WITH s AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier)
           |SELECT s_suppkey, s_name, s_acctbal,
           |       TIMESTAMP '$t1' AS valid_from,
           |       CASE WHEN s_suppkey % 3 = 0 THEN TIMESTAMP '$t2' END AS valid_to,
           |       s_suppkey % 3 <> 0 AS is_current
           |FROM s
           |UNION ALL
           |SELECT s_suppkey, s_name, s_acctbal + 100.0, TIMESTAMP '$t2',
           |       NULL, true
           |FROM s WHERE s_suppkey % 3 = 0
           |UNION ALL
           |SELECT s_suppkey + (SELECT max(s_suppkey) * 10 FROM s),
           |       s_name, s_acctbal * 2, TIMESTAMP '$t2',
           |       NULL, true
           |FROM s WHERE s_suppkey % 5 = 0""".stripMargin))
  }

  /** q71 — INCREMENTAL MATERIALIZED-AGGREGATE maintenance: a running
    * (user_id, day) → (n_events, cents) aggregate table is maintained
    * across two ingest batches by merging per-batch PARTIAL aggregates
    * into the persisted state (full-outer on the keys, summed with
    * coalesce) — the algebraic-MV pattern every warehouse needs once
    * recomputing the aggregate means rescanning history. Hash-green
    * against the direct full aggregate proves merge(partial₁, partial₂)
    * ≡ agg(batch₁ ∪ batch₂).
    *
    * Scale: each batch shuffles only ITS OWN rows (map-side combine);
    * the merge joins state-sized relations on the group key. Cost per
    * refresh is O(batch + state), never O(history of raw events). */
  val q71 = {
    val cut = "2024-01-20"
    Q("q71_incremental_agg",
      (s, d) => {
        val base = s"/tmp/graft_mv/${java.nio.file.Paths.get(d).getFileName}"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        def partial(batch: org.apache.spark.sql.DataFrame) =
          batch.groupBy(col("user_id"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events"),
              sum(round(col("value") * 100).cast("bigint")).as("cents"))
        val e = graft.tables.Catalog.events(s, d)
        // batch 1 → state v1 (persisted)
        partial(e.filter(col("ts") < lit(cut).cast("timestamp")))
          .write.parquet(s"$base/state_v1")
        // batch 2 merged INTO the persisted state → state v2
        val v1 = s.read.parquet(s"$base/state_v1")
        val p2 = partial(e.filter(col("ts") >= lit(cut).cast("timestamp")))
          .withColumnRenamed("n_events", "n2").withColumnRenamed("cents", "c2")
        v1.join(p2, Seq("user_id", "day"), "full_outer")
          .select(col("user_id"), col("day"),
            (coalesce(col("n_events"), lit(0L)) + coalesce(col("n2"), lit(0L)))
              .as("n_events"),
            (coalesce(col("cents"), lit(0L)) + coalesce(col("c2"), lit(0L)))
              .as("cents"))
          .write.parquet(s"$base/state_v2")
        s.read.parquet(s"$base/state_v2")
      },
      Some(
        """SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
          |  count(*) AS n_events,
          |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM events GROUP BY 1, 2""".stripMargin))
  }

  /** q108 — MERGE (upsert) application: one CDC change batch — deletes,
    * updates, inserts keyed on c_custkey — applied to a base snapshot in
    * a single pass, the `MERGE INTO … WHEN MATCHED/NOT MATCHED` protocol
    * of warehouse SQL re-expressed for a file-based target (the
    * row-level sibling of IncrementalLoad's partition-level
    * delete-insert). Shape: ONE left join of base onto the change batch
    * (broadcast when the batch is dimension-sized, shuffle otherwise)
    * deciding keep/update/delete per row, plus a union of the inserts —
    * never a per-op pass over the target. Money handled as exact cents.
    * The change batch is derived deterministically from the base so the
    * oracle can reconstruct it. */
  val q108 = Q("q108_merge_upsert",
    (s, d) => {
      val base = graft.tables.Catalog.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("bigint").as("c_nationkey"),
          round(col("c_acctbal") * 100).cast("bigint").as("bal_cents"),
          col("c_mktsegment"))
      // the CDC batch: key%10==0 → D, key%10==1 → U (+$123.45), and an
      // insert stream keyed above the base range for key%10==2
      val matched = base.filter(col("c_custkey") % 10 <= 1)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, "D").otherwise("U").as("op"),
          (col("bal_cents") + 12345L).as("new_bal_cents"))
      val inserts = base.filter(col("c_custkey") % 10 === 2)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("NewCustomer#"), col("c_custkey").cast("string"))
            .as("c_name"),
          col("c_nationkey"), col("bal_cents"), col("c_mktsegment"),
          lit("inserted").as("row_status"))
      base.join(matched, Seq("c_custkey"), "left")
        .filter(col("op").isNull || col("op") === "U") // WHEN MATCHED DELETE
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          when(col("op") === "U", col("new_bal_cents"))
            .otherwise(col("bal_cents")).as("bal_cents"), // WHEN MATCHED UPDATE
          col("c_mktsegment"),
          when(col("op") === "U", "updated").otherwise("kept")
            .as("row_status"))
        .unionByName(inserts) // WHEN NOT MATCHED INSERT
    },
    Some(
      """WITH base AS (
        |  SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, c_mktsegment
        |  FROM customer)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 10 = 1 THEN bal_cents + 12345
        |       ELSE bal_cents END AS bal_cents,
        |  c_mktsegment,
        |  CASE WHEN c_custkey % 10 = 1 THEN 'updated' ELSE 'kept' END
        |    AS row_status
        |FROM base WHERE c_custkey % 10 <> 0
        |UNION ALL
        |SELECT c_custkey + 1000000, 'NewCustomer#' || c_custkey,
        |  c_nationkey, bal_cents, c_mktsegment, 'inserted'
        |FROM base WHERE c_custkey % 10 = 2""".stripMargin))

  /** q113 — SNAPSHOT DIFF / change-data-feed GENERATION
    * ([[graft.ops.SnapshotDiff]]): q108's inverse — given two snapshots
    * of a keyed table, derive the I/U/D batch that turns one into the
    * other, in ONE key-partitioned full-outer join (at 100 TB both
    * snapshots are bucketed on the key, so the join is co-located; no
    * driver state, nothing O(n²)). Update detection is null-safe struct
    * equality, so NULL↔value transitions classify as updates. Snapshots
    * are derived deterministically from orders: "old" drops key%97==0,
    * "new" drops key%89==0 and bumps totalprice by $1 for key%13==0 —
    * so the expected feed is reconstructible by the oracle. */
  val q113 = Q("q113_snapshot_diff",
    (s, d) => {
      val base = graft.tables.Catalog.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("bigint").as("price_cents"))
      val oldSnap = base.filter(col("o_orderkey") % 97 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("price_cents",
          when(col("o_orderkey") % 13 === 0, col("price_cents") + 100L)
            .otherwise(col("price_cents")))
      graft.ops.SnapshotDiff.diff(oldSnap, newSnap,
        keyCols = Seq("o_orderkey"),
        compareCols = Seq("o_orderstatus", "price_cents"))
    },
    Some(
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders),
        |old AS (SELECT * FROM base WHERE o_orderkey % 97 <> 0),
        |new AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 100
        |         ELSE price_cents END AS price_cents
        |  FROM base WHERE o_orderkey % 89 <> 0)
        |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
        |  CASE WHEN old.o_orderkey IS NULL THEN 'I'
        |       WHEN new.o_orderkey IS NULL THEN 'D'
        |       ELSE 'U' END AS change_type
        |FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
        |  OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
        |  OR old.price_cents IS DISTINCT FROM new.price_cents""".stripMargin))

  /** q117 — INCREMENTAL DISTINCT-COUNT STATE (q71 × q106): the
    * daily-active-users state table is per-day HLL sketches, and a
    * late-arriving delta batch maintains it by sketching ITSELF and
    * merging in with one day-keyed outer join — `hll_union` on the one
    * overlapping day (the cutoff falls mid-day to force that path),
    * pass-through for history days. Raw history is never re-read after
    * bootstrap: maintenance cost is O(state + delta), and the state
    * stays mergeable for further roll-ups (weekly/monthly), which a
    * stored `count(DISTINCT)` number can never be. Oracle verifies the
    * estimate contract per day (lgK=12 → 3σ ≈ 4.9%): exact distinct
    * users + bound flag, DuckDB emits TRUE. */
  val q117 = Q("q117_incremental_distinct_state",
    (s, d) => {
      val ev = graft.tables.Catalog.events(s, d)
        .withColumn("day", to_date(col("ts")))
      val cutoff = lit("2024-01-20 12:00:00").cast("timestamp")
      val state = ev.filter(col("ts") < cutoff)
        .groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
      val delta = ev.filter(col("ts") >= cutoff)
        .groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
        .toDF("day_d", "sk_d") // renamed: both derive from ev (self-join)
      val nextState = state
        .join(delta, col("day") === col("day_d"), "full_outer")
        .select(coalesce(col("day"), col("day_d")).as("day"),
          when(col("sk").isNotNull && col("sk_d").isNotNull,
            hll_union(col("sk"), col("sk_d")))
            .otherwise(coalesce(col("sk"), col("sk_d"))).as("sk"))
      val exact = ev.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(
          nextState.select(col("day").as("day_s"),
            hll_sketch_estimate(col("sk")).as("approx")),
          col("day") === col("day_s"))
        .select(col("day"), col("exact_users"),
          (abs(col("approx") - col("exact_users"))
            <= col("exact_users") * lit(0.05)).as("within_bound"))
    },
    Some(
      """SELECT CAST(ts AS DATE) AS day,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS within_bound
        |FROM events GROUP BY 1""".stripMargin))

  /** q128 — DATA-QUALITY EXPECTATIONS (the dbt-test / Deequ constraint
    * audit every managed pipeline runs before publish): NOT NULL,
    * key uniqueness, referential integrity, a value-range bound and an
    * accepted-values set, each reported as (violations, checked).
    * Bounds are deliberately tight enough that two constraints FIRE on
    * this corpus — an audit whose failure path is never exercised
    * verifies nothing. Shape: one conditional aggregate per table plus
    * one anti-join count for the FK — no row ever leaves the executors,
    * the audit output is O(constraints). */
  val q128 = {
    import graft.tables.Catalog
    Q("q128_expectations",
      (s, d) => {
        val o = Catalog.orders(s, d)
        val l = Catalog.lineitem(s, d)
        def row(name: String, violations: Column, checked: Column,
            src: org.apache.spark.sql.DataFrame) =
          src.agg(violations.cast("bigint").as("violations"),
              checked.cast("bigint").as("checked"))
            .select(lit(name).as("constraint_name"), col("violations"),
              col("checked"))
        val fk = l.join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        row("orders.o_custkey NOT NULL",
            count(when(col("o_custkey").isNull, 1)), count(lit(1)), o)
          .unionAll(row("orders.o_orderkey UNIQUE",
            count(lit(1)) - countDistinct(col("o_orderkey")),
            count(lit(1)), o))
          .unionAll(row("orders.o_orderstatus IN ('O','F')",
            count(when(!col("o_orderstatus").isin("O", "F"), 1)),
            count(lit(1)), o))
          .unionAll(row("lineitem.l_discount <= 0.08",
            count(when(col("l_discount") > 0.08, 1)), count(lit(1)), l))
          .unionAll(fk.agg(count(lit(1)).cast("bigint").as("violations"))
            .crossJoin(l.agg(count(lit(1)).cast("bigint").as("checked")))
            .select(lit("lineitem.l_orderkey FK orders")
              .as("constraint_name"), col("violations"), col("checked")))
      },
      Some(
        """SELECT 'orders.o_custkey NOT NULL' AS constraint_name,
          |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
          |    AS violations,
          |  CAST(count(*) AS BIGINT) AS checked FROM orders
          |UNION ALL
          |SELECT 'orders.o_orderkey UNIQUE',
          |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
          |  CAST(count(*) AS BIGINT) FROM orders
          |UNION ALL
          |SELECT 'orders.o_orderstatus IN (''O'',''F'')',
          |  CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F'))
          |       AS BIGINT),
          |  CAST(count(*) AS BIGINT) FROM orders
          |UNION ALL
          |SELECT 'lineitem.l_discount <= 0.08',
          |  CAST(count(*) FILTER (WHERE l_discount > 0.08) AS BIGINT),
          |  CAST(count(*) AS BIGINT) FROM lineitem
          |UNION ALL
          |SELECT 'lineitem.l_orderkey FK orders',
          |  CAST((SELECT count(*) FROM lineitem l
          |        WHERE NOT EXISTS (SELECT 1 FROM orders o
          |                          WHERE o.o_orderkey = l.l_orderkey))
          |       AS BIGINT),
          |  CAST(count(*) AS BIGINT) FROM lineitem""".stripMargin))
  }

  /** q131 — OBSERVED METRICS (`Dataset.observe`): pipeline audit
    * counters collected DURING a real write job — zero extra scans,
    * the mechanism for q13-style audit counts at 100 TB where a
    * second pass over the data to count it is unaffordable. The query
    * writes lineitem through an observed projection, then returns the
    * accumulated metrics as a one-row frame; the oracle recomputes the
    * same aggregates declaratively — equality proves the streaming-
    * accumulated metrics match a dedicated aggregation pass. */
  val q131 = {
    import graft.tables.Catalog
    Q("q131_observed_metrics",
      (s, d) => {
        val tag = java.nio.file.Paths.get(d).getFileName.toString
          .replaceAll("[^A-Za-z0-9]", "_")
        val obs = org.apache.spark.sql.Observation()
        Catalog.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
          .observe(obs,
            count(lit(1)).as("rows_written"),
            sum(round(col("l_quantity") * 100).cast("bigint"))
              .as("qty_cents"),
            count(when(col("l_discount") > 0.08, 1)).as("flagged_rows"))
          .write.mode("overwrite")
          .parquet(s"/tmp/graft_observe/$tag/lineitem_copy")
        val m = obs.get
        import s.implicits._
        Seq((m("rows_written").asInstanceOf[Long],
          m("qty_cents").asInstanceOf[Long],
          m("flagged_rows").asInstanceOf[Long]))
          .toDF("rows_written", "qty_cents", "flagged_rows")
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS rows_written,
          |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
          |    AS qty_cents,
          |  CAST(count(*) FILTER (WHERE l_discount > 0.08) AS BIGINT)
          |    AS flagged_rows
          |FROM lineitem""".stripMargin))
  }

  /** q139 — SQL FRONT DOOR for the flagship fact build: the reference's
    * audience drives its engine with SQL text
    * (ref `Incremental_load_fact_item_status.sql:40-314`), so the
    * three branches are registered as NAMED VIEWS and the fact union is
    * issued as a `spark.sql` statement — explicit 25-column projection,
    * positional UNION ALL, exactly the reference's statement shape.
    * Same oracle as q11: hash-green proves the SQL entry point and the
    * Scala API produce byte-identical facts. (Catalyst plans the view
    * bodies identically to q11's DataFrames — views are logical-plan
    * aliases, so this adds API surface, not a second engine path.) */
  val q139 = {
    val cols = graft.etl.Fact.columns.mkString(",\n  ")
    // Statement text is parsed + ANALYZED once per (session, dataset,
    // source generation) and the resolved DataFrame reused — the
    // session-catalog behavior a repeated-dashboard statement gets from
    // any engine's plan cache (the Scala path's branch builders are
    // likewise per-run constant). Re-running the memoized frame
    // re-optimizes + re-executes; only parse/view-resolution of the
    // 15-join trees is amortized, so the result cannot differ from a
    // fresh statement (q139 stays hash-equal to q11's oracle).
    Q("q139_sql_fact_frontdoor",
      (s, d) => memoized(s, "q139", d)({
        graft.tables.Catalog.registerViews(s, d)
        ItemStatus.build(s, d, itemStatusOffset)
          .createOrReplaceTempView("fact_branch_item_status")
        AggChina.build(s, d, chinaOffset)
          .createOrReplaceTempView("fact_branch_agg_china")
        Tomford.build(s, d, tomfordOffset)
          .createOrReplaceTempView("fact_branch_tomford")
        s.sql(
          s"""SELECT $cols FROM fact_branch_item_status
             |UNION ALL
             |SELECT $cols FROM fact_branch_agg_china
             |UNION ALL
             |SELECT $cols FROM fact_branch_tomford""".stripMargin)
      }),
      Some(s"($b1Sql)\nUNION ALL\n($b2Sql)\nUNION ALL\n($b3Sql)"))
  }

  /** q151 — SQL FRONT DOOR for MERGE: q108's CDC batch driven through a
    * real `MERGE INTO … WHEN MATCHED/NOT MATCHED` STATEMENT
    * ([[graft.ops.SqlMutations.merge]] — parsed by Catalyst's own
    * parser, lowered to the same one-join-plus-insert-union shape
    * q108 hand-builds), because the reference's audience operates in
    * SQL text (ref `Incremental_load_fact_item_status.sql:29-34`).
    * Same oracle as q108: hash-green proves statement text and Scala
    * protocol produce byte-identical merges. The target carries
    * `row_status` so MERGE can mark update provenance the way q108's
    * dataflow does (MERGE cannot invent columns). */
  val q151 = Q("q151_sql_merge_frontdoor",
    (s, d) => {
      val base = graft.tables.Catalog.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("bigint").as("c_nationkey"),
          round(col("c_acctbal") * 100).cast("bigint").as("bal_cents"),
          col("c_mktsegment"))
      base.withColumn("row_status", lit("kept"))
        .createOrReplaceTempView("merge_target")
      // ONE CDC relation: the q108 batch as a single MERGE source —
      // D/U ops carry the new balance, I ops carry the insert payload
      val matched = base.filter(col("c_custkey") % 10 <= 1)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, "D").otherwise("U").as("op"),
          (col("bal_cents") + 12345L).as("new_bal_cents"),
          lit(null).cast("string").as("c_name"),
          lit(null).cast("bigint").as("c_nationkey"),
          lit(null).cast("bigint").as("bal_cents"),
          lit(null).cast("string").as("c_mktsegment"))
      val inserts = base.filter(col("c_custkey") % 10 === 2)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          lit("I").as("op"),
          lit(null).cast("bigint").as("new_bal_cents"),
          concat(lit("NewCustomer#"), col("c_custkey").cast("string"))
            .as("c_name"),
          col("c_nationkey"), col("bal_cents"), col("c_mktsegment"))
      matched.unionByName(inserts)
        .createOrReplaceTempView("merge_changes")
      graft.ops.SqlMutations.merge(s,
        """MERGE INTO merge_target t USING merge_changes s
          |ON t.c_custkey = s.c_custkey
          |WHEN MATCHED AND s.op = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET
          |  bal_cents = s.new_bal_cents, row_status = 'updated'
          |WHEN NOT MATCHED THEN INSERT
          |  (c_custkey, c_name, c_nationkey, bal_cents, c_mktsegment,
          |   row_status)
          |  VALUES (s.c_custkey, s.c_name, s.c_nationkey, s.bal_cents,
          |          s.c_mktsegment, 'inserted')""".stripMargin)
    },
    q108.oracle)

  /** q161 — SQL FRONT DOOR for UPDATE, completing the mutation-triad
    * statement surface (q151 MERGE, q152 DELETE): a real
    * `UPDATE … SET … WHERE` statement over a registered view,
    * Catalyst-parsed and lowered to the one-pass conditional column
    * rewrite ([[graft.ops.SqlMutations.update]]) — the way engines
    * without in-place mutation actually execute it. The debt write-off
    * here (negative balances floored to zero) is the reference
    * audience's bread-and-butter correction statement. */
  val q161 = Q("q161_sql_update_frontdoor",
    (s, d) => {
      graft.tables.Catalog.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("bigint").as("bal_cents"),
          col("c_mktsegment"))
        .createOrReplaceTempView("update_target")
      graft.ops.SqlMutations.update(s,
        "UPDATE update_target t SET bal_cents = 0 WHERE bal_cents < 0")
    },
    Some(
      """SELECT c_custkey, c_name,
        |  CAST(CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0
        |       THEN 0
        |       ELSE CAST(round(c_acctbal * 100) AS BIGINT) END
        |    AS BIGINT) AS bal_cents,
        |  c_mktsegment
        |FROM customer""".stripMargin))

  val all: Seq[Q] = Seq(q08, q09, q10, q11, q48, q71, q108, q113, q117,
    q128, q131, q139, q151, q161)
}
