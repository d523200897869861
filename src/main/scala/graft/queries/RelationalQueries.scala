package graft.queries

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.streaming.StreamingLoad
import graft.tables.Catalog

/** Relational operators the reference doesn't use but Spark gives for
  * free (SURVEY.md §2.5/§2.7 "not present" notes) — exposed so a user of
  * the engine has the full surface: semi/anti joins, INTERSECT/EXCEPT,
  * ROLLUP with grouping ids, distinct aggregates, window analytics
  * (lag/rank/cumulative frames), and the Structured Streaming ingest.
  */
object RelationalQueries {

  /** q26 — streaming ingest end state: the file-source stream with
    * watermark + key dedup must reproduce the batch relation exactly. */
  val q26 = Q("q26_streaming_ingest",
    (s, d) => {
      val base = s"${graft.ops.Scratch.dir(s)}/graft_stream/q26_${java.nio.file.Paths.get(d).getFileName}"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val conf = s.sparkContext.hadoopConfiguration
      FileUtil.copy(fs, new Path(s"$d/events.parquet"),
        fs, new Path(s"$base/src/events.parquet"), false, conf)
      StreamingLoad.ingest(s, s"$base/src", s"$base/target")
      s.read.parquet(s"$base/target")
    },
    Some(
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events""".stripMargin))

  /** q27 — left-semi + left-anti joins (EXISTS / NOT EXISTS). The build
    * side is pre-shrunk to distinct keys: a semi join only needs the key
    * set, so broadcasting 1.5k keys beats hashing 150k full rows twice. */
  val q27 = Q("q27_semi_anti_join",
    (s, d) => {
      val c = Catalog.customer(s, d).select(col("c_custkey"), col("c_name"))
      val keys = broadcast(
        Catalog.orders(s, d).select(col("o_custkey")).distinct())
      val semi = c.join(keys, c("c_custkey") === keys("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(1L))
      val anti = c.join(keys, c("c_custkey") === keys("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(0L))
      semi.unionAll(anti)
    },
    Some(
      """SELECT c_custkey, c_name, CAST(1 AS BIGINT) AS has_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(0 AS BIGINT)
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin))

  /** q28 — INTERSECT / EXCEPT (both DISTINCT semantics). */
  val q28 = Q("q28_set_ops",
    (s, d) => {
      val o = Catalog.orders(s, d)
      def keys(st: String) =
        o.filter(col("o_orderstatus") === st).select(col("o_custkey"))
      keys("F").intersect(keys("O")).except(keys("P"))
    },
    Some(
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin))

  /** q29 — ROLLUP aggregation with grouping id. */
  val q29 = Q("q29_rollup",
    (s, d) => Catalog.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"),
        grouping_id().cast("bigint").as("gid")),
    Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin))

  /** q30 — exact distinct aggregates per group. */
  val q30 = Q("q30_distinct_agg",
    (s, d) => Catalog.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n")),
    Some(
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin))

  /** q31 — approximate distinct (HLL). The sketch estimate is
    * engine-specific, so the oracle verifies its CONTRACT instead of its
    * value: output the exact distinct count plus a boolean asserting the
    * HLL estimate landed within 3σ (rsd=0.05 → 15%) of exact; DuckDB
    * emits literal TRUE. HLL is deterministic for fixed input, so the
    * hash compare is stable — and fails if the sketch ever degrades. */
  val q31 = Q("q31_approx_distinct",
    (s, d) => Catalog.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey")).as("approx"))
      .select(col("o_orderpriority"), col("exact_cust"),
        (abs(col("approx") - col("exact_cust"))
          <= col("exact_cust") * lit(0.15)).as("within_3sigma")),
    Some(
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
        |  TRUE AS within_3sigma
        |FROM orders GROUP BY 1""".stripMargin))

  /** q32 — window analytics beyond argmax: lag, rank, cumulative sum. */
  val q32 = Q("q32_window_analytics",
    (s, d) => {
      val fx = graft.etl.Forex.base(s, d) // (currency, year, month, decimal rate)
      val wTime = Window.partitionBy(col("from_currency"))
        .orderBy(col("cal_year"), col("cal_month"))
      val wRank = Window.partitionBy(col("from_currency"))
        .orderBy(col("conversion_rate").desc, col("cal_year"), col("cal_month"))
      fx.select(col("from_currency"), col("cal_year").cast("bigint"),
          col("cal_month").cast("bigint"),
          col("conversion_rate").cast("double").as("rate"),
          lag(col("conversion_rate"), 1).over(wTime).cast("double")
            .as("prev_rate"),
          rank().over(wRank).cast("bigint").as("rate_rank"),
          sum(col("conversion_rate")).over(
            wTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("cum_rate"))
    },
    Some {
      val forexSql =
        """SELECT o_orderpriority AS from_currency,
          |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cal_year,
          |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS cal_month,
          |       max(CAST(o_totalprice AS DECIMAL(18,2))) AS conversion_rate
          |FROM orders GROUP BY 1, 2, 3""".stripMargin
      s"""WITH forex AS ($forexSql)
         |SELECT from_currency, cal_year, cal_month,
         |  CAST(conversion_rate AS DOUBLE) AS rate,
         |  CAST(lag(conversion_rate, 1) OVER w AS DOUBLE) AS prev_rate,
         |  CAST(rank() OVER (PARTITION BY from_currency
         |    ORDER BY conversion_rate DESC, cal_year, cal_month) AS BIGINT)
         |    AS rate_rank,
         |  CAST(sum(conversion_rate) OVER (PARTITION BY from_currency
         |    ORDER BY cal_year, cal_month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS cum_rate
         |FROM forex
         |WINDOW w AS (PARTITION BY from_currency ORDER BY cal_year, cal_month)""".stripMargin
    })

  /** q34 — JSON extraction over the events `props` column (semi-
    * structured payload handling: get_json_object + typed cast + agg). */
  val q34 = Q("q34_json_extract",
    (s, d) => Catalog.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k")),
    Some(
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin))

  /** q35 — pivot (long → wide): events per user by type. The oracle uses
    * the portable CASE-sum formulation (= what pivot compiles to). */
  val q35 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Q("q35_pivot",
      (s, d) => Catalog.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L),
      Some {
        val cols = types.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
          .mkString(",\n  ")
        s"""SELECT user_id,
           |  $cols
           |FROM events GROUP BY 1""".stripMargin
      })
  }

  /** q37 — gap-based sessionization (lag → new-session flag → running
    * sum → per-session agg). Measure sums in exact cents (order-free). */
  val q37 = Q("q37_sessionize",
    (s, d) => graft.ops.Sessionize.batch(Catalog.events(s, d)),
    Some(
      s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |           FROM events),
         |w AS (SELECT *, lag(ts) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id) AS prev_ts FROM e),
         |f AS (SELECT *, CASE WHEN prev_ts IS NULL
         |        OR epoch_us(ts) - epoch_us(prev_ts) > ${graft.ops.Sessionize.gapMicros}
         |        THEN 1 ELSE 0 END AS new_session FROM w),
         |x AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |        AS session_idx FROM f)
         |SELECT user_id, session_idx, min(ts) AS session_start,
         |       max(ts) AS session_end, count(*) AS n_events,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |         AS value_cents
         |FROM x GROUP BY 1, 2""".stripMargin))

  /** q38 — JSON-lines round trip (source/sink surface beyond CSV and
    * parquet): write, re-infer, normalize; oracle from the parquet
    * source so the JSON hop's fidelity is under test. */
  val q38 = Q("q38_json_roundtrip",
    (s, d) => {
      val out = s"/tmp/graft_json/${java.nio.file.Paths.get(d).getFileName}/orders_json"
      Catalog.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .coalesce(1).write.mode("overwrite").json(out)
      s.read.json(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders""".stripMargin))

  /** q39 — ORC round trip (columnar sink beyond parquet). */
  val q39 = Q("q39_orc_roundtrip",
    (s, d) => {
      val out = s"/tmp/graft_orc/${java.nio.file.Paths.get(d).getFileName}/lineitem_orc"
      Catalog.lineitem(s, d)
        .filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
    },
    Some(
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem WHERE l_quantity >= 25""".stripMargin))

  /** q40 — top-k terms per language (the wordcount+rank composite). */
  val q40 = Q("q40_top_terms",
    (s, d) => {
      val counts = Catalog.documents(s, d)
        .select(col("lang"), explode(split(col("text"), "\\s+")).as("token"))
        .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      graft.ops.Functions.latestBy(counts, Seq("lang"),
        Seq(col("n").desc, col("token"))) // top-1 per lang via the argmax op
        .unionAll(counts.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(col("n").desc, col("token"))))
          .filter(col("rn").between(2, 5)).drop("rn"))
    },
    Some(
      """WITH c AS (
        |  SELECT lang, u.token, count(*) AS n
        |  FROM (SELECT lang, regexp_split_to_array(text, '\s+') AS toks
        |        FROM documents) t, unnest(t.toks) u(token)
        |  GROUP BY 1, 2)
        |SELECT lang, token, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY n DESC, token) AS rn FROM c)
        |WHERE rn <= 5""".stripMargin))

  /** q54 — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) plus
    * UNION DISTINCT, completing the set-operation family (q28 covers
    * the DISTINCT variants). Multiplicity matters: customers place
    * multiple orders per status. */
  val q54 = Q("q54_set_ops_all",
    (s, d) => {
      val o = Catalog.orders(s, d)
      def keys(st: String) =
        o.filter(col("o_orderstatus") === st).select(col("o_custkey"))
      keys("F").intersectAll(keys("O"))
        .exceptAll(keys("P"))
        .union(Catalog.customer(s, d)
          .filter(col("c_acctbal") < 0).select(col("c_custkey")))
        .distinct()
    },
    Some(
      """SELECT DISTINCT * FROM (
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |   INTERSECT ALL
        |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin))

  /** q64 — CUBE aggregation with grouping id (q29's rollup companion:
    * all 4 grouping-set combinations, one shuffle — Catalyst expands the
    * cube map-side, partial-aggregates each set before the exchange). */
  val q64 = Q("q64_cube",
    (s, d) => Catalog.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"),
        grouping_id().cast("bigint").as("gid")),
    Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin))

  /** q65 — RANGE-frame sliding window: per customer, rolling 30-day
    * order value (exact cents) and order count — the value-based frame
    * (peers by ORDER BY value distance, not row offsets) that rowsBetween
    * cannot express. One shuffle on o_custkey; the frame scan is a
    * per-partition sorted sweep. */
  val q65 = Q("q65_range_window",
    (s, d) => {
      val base = Catalog.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("bigint").as("dnum"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("dnum"))
        .rangeBetween(-30, Window.currentRow)
      base.select(col("o_orderkey"), col("o_custkey"), col("dnum"),
        sum(col("cents")).over(w).as("cents_30d"),
        count(lit(1)).over(w).cast("bigint").as("n_30d"))
    },
    Some(
      """SELECT o_orderkey, o_custkey, dnum,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_30d,
        |  CAST(count(*) OVER w AS BIGINT) AS n_30d
        |FROM (SELECT o_orderkey, o_custkey,
        |        CAST(date_diff('day', DATE '1992-01-01',
        |          CAST(o_orderdate AS DATE)) AS BIGINT) AS dnum,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY dnum
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin))

  /** q69 — SCHEMA EVOLUTION: two parquet batches with drifted schemas
    * (batch 2 drops one column, adds another) read back through
    * `mergeSchema` — the unified schema fills the gaps with NULLs. This
    * is the day-2 reality of any long-lived ingest path; the oracle
    * reconstructs the same union declaratively. */
  val q69 = Q("q69_schema_evolution",
    (s, d) => {
      val out = s"/tmp/graft_evolve/${java.nio.file.Paths.get(d).getFileName}/cust"
      val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(out), true)
      val c = Catalog.customer(s, d)
      // v1 writer: (key, name, acctbal)
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.parquet(s"$out/batch=1")
      // v2 writer: acctbal dropped, mktsegment added
      c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .write.parquet(s"$out/batch=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"), col("batch").cast("bigint").as("batch"))
    },
    Some(
      """SELECT c_custkey, c_name, c_acctbal, NULL AS c_mktsegment,
        |       CAST(1 AS BIGINT) AS batch
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, NULL, c_mktsegment, 2
        |FROM customer WHERE c_custkey % 2 = 1""".stripMargin))

  /** q72 — CORRUPT-RECORD tolerance: parse JSON payloads where a slice
    * of rows is malformed (leading brace stripped — nothing partially
    * salvageable, so Spark's partial-result parser and DuckDB's
    * json_valid agree exactly); bad rows yield NULL fields, good rows
    * parse, and the validity flag derives from the parsed field in both
    * engines identically. The JSON is built by identical string concat
    * on both sides — engine-native to_json renderings differ and would
    * be a false diff. */
  val q72 = Q("q72_corrupt_json",
    (s, d) => Catalog.orders(s, d)
      .withColumn("j0", concat(lit("{\"k\":"),
        col("o_orderkey").cast("string"), lit(",\"s\":\""),
        col("o_orderstatus"), lit("\"}")))
      .withColumn("j", when(col("o_orderkey") % 7 === 0,
        expr("substring(j0, 2)")).otherwise(col("j0")))
      .withColumn("p", from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING")))
      .select(col("o_orderkey"),
        col("p.k").as("k_parsed"), col("p.s").as("s_parsed"),
        col("p.k").isNotNull.as("is_valid")),
    Some(
      """WITH built AS (
        |  SELECT o_orderkey,
        |    '{"k":' || CAST(o_orderkey AS VARCHAR) || ',"s":"'
        |      || o_orderstatus || '"}' AS j0
        |  FROM orders),
        |corrupted AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN substr(j0, 2) ELSE j0 END AS j
        |  FROM built)
        |SELECT o_orderkey,
        |  CASE WHEN json_valid(j)
        |       THEN CAST(json_extract_string(j, '$.k') AS BIGINT) END
        |    AS k_parsed,
        |  CASE WHEN json_valid(j)
        |       THEN json_extract_string(j, '$.s') END AS s_parsed,
        |  (CASE WHEN json_valid(j)
        |        THEN CAST(json_extract_string(j, '$.k') AS BIGINT) END)
        |    IS NOT NULL AS is_valid
        |FROM corrupted""".stripMargin))

  /** q73 — NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM):
    * NULL keys MATCH each other, unlike plain `=` which drops them —
    * the semantics dirty dimension keys need. Aggregated to per-key
    * counts so the NULL×NULL product stays bounded in the output.
    *
    * r19: each side is counted per key BEFORE the null-safe join and
    * the pair count is the product — pairs-per-key equals the product
    * of the sides' key counts, so the result is identical while the
    * joined intermediate shrinks from Σ_k cl(k)·cr(k) rows (~45M at
    * sf0.1, quadratic per hot key at scale) to |keys|² at most (guide
    * §2.3 aggregate before the shuffle / §3.3 exploding joins). The
    * join itself stays `<=>` over the histograms — the semantics under
    * test — and the oracle still runs the row-level null-safe join. */
  val q73 = Q("q73_null_safe_join",
    (s, d) => {
      val l = Catalog.orders(s, d).select(
        when(col("o_orderkey") % 100 === 0, lit(null))
          .otherwise(col("o_custkey") % 50).as("lk"))
        .groupBy(col("lk")).agg(count(lit(1)).as("nl"))
      val r = Catalog.customer(s, d).select(
        when(col("c_custkey") % 100 === 0, lit(null))
          .otherwise(col("c_custkey") % 50).as("rk"))
        .groupBy(col("rk")).agg(count(lit(1)).as("nr"))
      l.join(r, col("lk") <=> col("rk"))
        .select(col("lk").as("k"), (col("nl") * col("nr")).as("n"))
    },
    Some(
      """WITH l AS (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |                  ELSE o_custkey % 50 END AS lk FROM orders),
        |r AS (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
        |             ELSE c_custkey % 50 END AS rk FROM customer)
        |SELECT lk AS k, count(*) AS n
        |FROM l JOIN r ON lk IS NOT DISTINCT FROM rk
        |GROUP BY 1""".stripMargin))

  /** q74 — explicit GROUPING SETS (beyond rollup q29 / cube q64): the
    * two single-column sets plus the grand total, with grouping ids. */
  val q74 = Q("q74_grouping_sets",
    (s, d) => Catalog.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"),
        grouping_id().cast("bigint").as("gid")),
    Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin))

  /** q76 — Z-ORDER (Morton) interleave of two dimensions — the
    * multi-dimensional clustering key behind data-skipping layouts:
    * sorting by z before writing makes file-level min/max zones narrow
    * on BOTH dimensions at once, so either predicate prunes files. The
    * 16-bit-per-dim interleave is generated from one parameter list on
    * both sides (pure integer bit ops, exact everywhere). Verified on
    * events: dim1 = user bucket, dim2 = minute of day. */
  val q76 = {
    val bits = 16
    def mortonCol(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) =
      (0 until bits).map { i =>
        shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
    val mortonSql = (0 until bits).map { i =>
      s"(((ub >> $i) & 1) << ${2 * i}) + (((md >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    Q("q76_zorder_key",
      (s, d) => Catalog.events(s, d)
        .select(col("event_id"), (col("user_id") % 1024).as("ub"),
          ((hour(col("ts")) * 60) + minute(col("ts"))).cast("bigint").as("md"))
        .select(col("event_id"), col("ub"), col("md"),
          mortonCol(col("ub"), col("md")).as("z")),
      Some(
        s"""SELECT event_id, ub, md, $mortonSql AS z
           |FROM (SELECT event_id,
           |        user_id % 1024 AS ub,
           |        CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) * 60
           |          + EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
           |          AS md
           |      FROM events)""".stripMargin))
  }

  /** q92 — UNPIVOT/melt (q35's inverse): the three lineitem money
    * columns become (measure, cents) rows via `stack` — a narrow
    * generator, zero shuffle; values go to exact cents so the melted
    * column is one portable integer type. The oracle is the explicit
    * UNION ALL expansion. */
  val q92 = Q("q92_unpivot",
    (s, d) => Catalog.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint")
        .as("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("bigint").as("p"),
        round(col("l_discount") * 100).cast("bigint").as("disc"),
        round(col("l_tax") * 100).cast("bigint").as("tax"))
      .selectExpr("l_orderkey", "l_linenumber",
        """stack(3, 'extendedprice', p, 'discount', disc, 'tax', tax)
           AS (measure, cents)"""),
    Some(
      """WITH c AS (SELECT l_orderkey,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tax
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
        |       p AS cents FROM c
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', disc FROM c
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax', tax FROM c""".stripMargin))

  /** q95 — approximate quantiles (the KLL/GK-family sketch behind
    * `percentile_approx`, the only way to get percentiles in one pass
    * over 100 TB without a per-group sort). Like q31, the oracle
    * verifies the sketch's CONTRACT, not its engine-specific value:
    * exact medians plus a flag that the approx landed within the
    * accuracy bound; DuckDB emits literal TRUE. At accuracy 10k on
    * 1e5-row groups the rank error is ≤ ~10 rows — the 2% value bound
    * is orders looser, so partition-order wiggle can't flip the flag. */
  val q95 = Q("q95_approx_quantile",
    (s, d) => Catalog.lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("bigint").as("c"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(c, 0.5)").as("exact_p50"),
        expr("percentile_approx(c, 0.5, 10000)").as("approx_p50"))
      .select(col("l_returnflag"), col("exact_p50"),
        (abs(col("approx_p50") - col("exact_p50"))
          <= col("exact_p50") * lit(0.02)).as("within_bound")),
    Some(
      """SELECT l_returnflag,
        |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)
        |    AS exact_p50,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY 1""".stripMargin))

  /** q105 — CORRELATED SUBQUERY breadth through the SQL front door:
    * EXISTS, NOT EXISTS, IN, and a correlated scalar COUNT subquery —
    * the forms SQL-pipeline users write instead of explicit semi/anti
    * joins (q27 is the DataFrame spelling). One shared SQL text runs in
    * BOTH engines, so the oracle also proves the front door parses the
    * same dialect. Catalyst decorrelates every form into joins —
    * RewritePredicateSubquery turns EXISTS/IN into semi/anti hash joins,
    * the scalar count into an aggregate + left join — so nothing here
    * executes per-row at scale. */
  val q105 = {
    val text =
      """SELECT c.c_custkey, c.c_mktsegment,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderpriority = '1-URGENT') AS n_urgent
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice < 5000)
        |  AND c.c_custkey IN (SELECT o_custkey FROM orders
        |                      WHERE o_orderdate >= TIMESTAMP '1996-01-01')""".stripMargin
    Q("q105_exists_subquery",
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql(text)
      },
      Some(text))
  }

  /** q106 — MERGEABLE DISTINCT SKETCHES (Apache DataSketches HLL): the
    * scale path for COUNT(DISTINCT) over 100 TB is not one giant
    * shuffle but per-partition sketches unioned upward — here per
    * (priority, month) sketches of the customer set are built with
    * `hll_sketch_agg`, then `hll_union_agg` merges twelve monthly
    * sketches into the per-priority estimate WITHOUT re-touching the
    * fact (the re-aggregation property q31's plain
    * approx_count_distinct doesn't expose). Like q31/q95 the oracle
    * verifies the sketch's contract, not its engine-specific value:
    * exact distinct plus a flag that the merged estimate landed within
    * 5% (lgK=12 → 3σ ≈ 4.9%); DuckDB emits literal TRUE. */
  val q106 = Q("q106_hll_sketch_merge",
    (s, d) => {
      val monthly = Catalog.orders(s, d)
        .groupBy(col("o_orderpriority"),
          month(col("o_orderdate")).as("m"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = monthly.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      val exact = Catalog.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_cust"))
      exact.join(merged, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_cust"),
          (abs(col("approx") - col("exact_cust"))
            <= col("exact_cust") * lit(0.05)).as("within_bound"))
    },
    Some(
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
        |  TRUE AS within_bound
        |FROM orders GROUP BY 1""".stripMargin))

  /** q107 — RANGE (INTERVAL) JOIN via day-bucket expansion: count
    * shipments falling inside each promo window `[o_orderdate,
    * o_orderdate + 3 days)` of the urgent-order sample. The naive form
    * is a pure theta join — every engine plans it as a nested loop over
    * fact × windows. The scale path: explode each window into the day
    * buckets it touches (≤4 rows per window — dimension-sized), equi-
    * join the fact on its OWN day bucket (broadcast, zero fact shuffle),
    * then apply the exact timestamp predicate as a residual filter.
    * Same bucketing trick as the as-of join family; works for any
    * bounded-width interval. The oracle IS the naive theta join —
    * hash-green proves the bucketed rewrite loses/duplicates nothing
    * (a window's boundary day buckets overlap the next window's). */
  val q107 = Q("q107_range_join",
    (s, d) => {
      val windows = Catalog.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT"
          && col("o_orderkey") % 29 === 0)
        .select(col("o_orderkey"), col("o_orderdate").as("ws"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("we"))
      val buckets = windows.withColumn("day",
        explode(sequence(to_date(col("ws")), to_date(col("we")))))
      val li = Catalog.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"),
          to_date(col("l_shipdate")).as("day"))
      val hits = li.join(broadcast(buckets), "day")
        .filter(col("l_shipdate") >= col("ws") && col("l_shipdate") < col("we"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      windows.join(hits, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n"), lit(0L)).cast("bigint").as("n_shipped"))
    },
    Some(
      """WITH w AS (
        |  SELECT o_orderkey, o_orderdate AS ws,
        |    o_orderdate + INTERVAL 3 DAY AS we
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 29 = 0)
        |SELECT w.o_orderkey,
        |  CAST(count(l.l_orderkey) AS BIGINT) AS n_shipped
        |FROM w LEFT JOIN lineitem l
        |  ON l.l_shipdate >= w.ws AND l.l_shipdate < w.we
        |GROUP BY 1""".stripMargin))

  /** q111 — BLOOM-FILTER SEMI-JOIN REDUCTION ([[graft.ops.BloomPrune]]):
    * lineitem is pre-filtered by a broadcast bloom filter over the
    * urgent-order key set BEFORE the exact semi join, so at scale the
    * shuffle carries only might-match rows — the explicit, heuristics-
    * independent form of Spark's InjectRuntimeFilter, built from the
    * same internal BloomFilterAggregate / BloomFilterMightContain
    * expressions. The bloom is a few hundred KB regardless of key count
    * (where a broadcast hash relation of the keys would not be), and
    * false positives are removed by the exact join that follows — the
    * oracle is the PLAIN semi join, so hash-green proves the prune is
    * result-invisible. */
  val q111 = Q("q111_bloom_semi_join",
    (s, d) => {
      val urgent = Catalog.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.ops.BloomPrune.semiJoin(
        Catalog.lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("bigint")).as("qty_cents"))
    },
    Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin))

  /** q112 — MERGEABLE FREQUENCY SKETCHES (count-min heavy hitters,
    * [[graft.functions.CmsMergeAgg]]/[[graft.functions.CmsEstimate]]):
    * q106's roll-up story for COUNTS instead of DISTINCTs. Per-month
    * sketches of the part-key stream are built with Spark's builtin
    * `count_min_sketch`, merged upward by the custom cms_merge
    * aggregate (partial/final merged map-side — the fact is touched
    * once, ever), and the merged sketch is probed for the 20 true
    * heaviest keys. Like q31/q95/q106 the oracle verifies the sketch's
    * CONTRACT, not an engine value: exact counts plus the CMS bound
    * `exact ≤ estimate ≤ exact + ⌈ε·N⌉` (deterministic here — fixed
    * seed); DuckDB emits literal TRUE. */
  val q112 = Q("q112_cms_heavy_hitters",
    (s, d) => {
      val eps = 1e-4; val conf = 0.999; val seed = 7
      val li = Catalog.lineitem(s, d)
      val monthly = li
        .groupBy(month(col("l_shipdate")).as("m"))
        .agg(count_min_sketch(col("l_partkey"),
            lit(eps), lit(conf), lit(seed)).as("sk"),
          count(lit(1)).as("n"))
      val merged = monthly.agg(
        graft.functions.CmsSketch.merge(col("sk"), eps, conf, seed).as("sk"),
        sum(col("n")).as("total"))
      val top = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("l_partkey")).limit(20)
      val est = graft.functions.CmsSketch.estimate(col("sk"), col("l_partkey"))
      top.crossJoin(broadcast(merged))
        .select(col("l_partkey"), col("exact_n"),
          (est >= col("exact_n") &&
            est <= col("exact_n") + ceil(lit(eps) * col("total")).cast("bigint"))
            .as("within_bound"))
    },
    Some(
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY 1
        |ORDER BY exact_n DESC, l_partkey LIMIT 20""".stripMargin))

  /** q116 — JOIN-SIZE ESTIMATION WITHOUT THE JOIN
    * ([[graft.functions.FreqSketchAgg]]/[[graft.functions.SketchInnerProduct]]):
    * the AMS/count-min inner-product technique — each side's key
    * frequencies are sketched in ONE map-side-combined scan, and
    * `min_i Σ_j A[i][j]·B[i][j]` over the two KB-sized tables estimates
    * `|orders ⋈ lineitem|` before any join executes. This is the input
    * a cost-based planner needs to pick broadcast vs shuffle vs skew
    * handling up front; at 100 TB the sketches cost two scans that
    * pipeline with whatever else reads the tables, vs actually running
    * the join to find out. Oracle pattern of q106/q112: exact join size
    * plus a flag that the deterministic (fixed-seed) estimate obeys
    * `true ≤ est ≤ true + ε·Na·Nb`; DuckDB emits literal TRUE. */
  val q116 = Q("q116_join_size_estimate",
    (s, d) => {
      val depth = 5; val width = 4096; val seed = 99L
      val o = Catalog.orders(s, d)
      val l = Catalog.lineitem(s, d)
      val skO = o.agg(
        graft.functions.FreqSketch.agg(col("o_orderkey"), depth, width, seed)
          .as("sk_o"), count(lit(1)).as("n_o"))
      val skL = l.agg(
        graft.functions.FreqSketch.agg(col("l_orderkey"), depth, width, seed)
          .as("sk_l"), count(lit(1)).as("n_l"))
      val est = graft.functions.FreqSketch.innerProduct(col("sk_o"), col("sk_l"))
      val trueSize = o.select(col("o_orderkey"))
        .join(l.select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("true_join_rows"))
      // ε = e/width; slack = ⌈ε·n_o·n_l⌉ (the CM inner-product bound)
      trueSize.crossJoin(skO.crossJoin(skL))
        .select(col("true_join_rows"),
          (est >= col("true_join_rows") &&
            est <= col("true_join_rows") +
              ceil(lit(math.E / width) * col("n_o") * col("n_l"))
                .cast("bigint")).as("within_bound"))
    },
    Some(
      """SELECT CAST(count(*) AS BIGINT) AS true_join_rows,
        |  TRUE AS within_bound
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin))

  /** q126 — ORDERED STRING AGGREGATION (LISTAGG/string_agg): customer
    * names per nation, sorted then joined. Spark has no ordered
    * string_agg aggregate; the portable-and-parallel form is
    * collect_list → array_sort → array_join, which keeps the sort
    * per-group on the executors (never a global ORDER BY) and is
    * deterministic regardless of partitioning — the property the SQL
    * `WITHIN GROUP (ORDER BY …)` clause exists to provide. */
  val q126 = Q("q126_string_agg",
    (s, d) => Catalog.customer(s, d)
      .join(broadcast(Catalog.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        array_join(array_sort(collect_list(col("c_name"))), "|")
          .as("names")),
    Some(
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        |       string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin))

  /** q130 — NATIVE SESSION WINDOWS: `session_window(ts, gap)` in batch
    * aggregation — the declarative form of q37's hand-built
    * sessionization and the exact batch analog of the streaming session
    * operator. The oracle derives sessions from first principles
    * (gaps-and-islands over [ts, ts+gap) intervals) — hash-equality
    * proves Spark's session semantics against the textbook definition,
    * including the boundary rule: an event AT the previous session's
    * end (s = prev_end) starts a NEW session, because [s, s+gap)
    * intervals merge only when they properly overlap. One keyed
    * aggregation; Spark plans it as a single exchange on user_id. */
  val q130 = Q("q130_session_window",
    (s, d) => Catalog.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("cents_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("cents_sum")),
    Some(
      """WITH iv AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_end
        |  FROM iv),
        |isl AS (
        |  SELECT *, sum(CASE WHEN prev_end IS NULL OR s >= prev_end
        |                     THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY user_id ORDER BY s, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS island
        |  FROM m)
        |SELECT user_id, min(s) AS session_start, max(e) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM isl GROUP BY user_id, island""".stripMargin))

  /** q135 — EXACT mergeable distinct counts via BITMAPS: the exact
    * sibling of q106's HLL roll-up. Per (month, bucket) the customer
    * keys aggregate into RoaringBitmap-style byte arrays
    * (bitmap_construct_agg over bitmap_bit_position); monthly distinct
    * = Σ bitmap_count, and the GLOBAL distinct re-aggregates the SAME
    * monthly bitmaps with bitmap_or_agg — the fact table is scanned
    * once ever, the upward roll-up merges kilobytes. Where HLL trades
    * exactness for fixed size, bitmaps stay exact at
    * O(key-range/8 bits) per bucket — the right tool when keys are
    * dense integers (surrogate keys), the wrong one for 64-bit sparse
    * hashes. The oracle is plain COUNT(DISTINCT) at both levels. */
  val q135 = Q("q135_bitmap_distinct",
    (s, d) => {
      val base = Catalog.orders(s, d).select(
        date_format(col("o_orderdate"), "yyyy-MM").as("scope"),
        col("o_custkey").as("k"))
      val bm = base
        .groupBy(col("scope"), expr("bitmap_bucket_number(k)").as("b"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(k))").as("bmp"))
      val monthly = bm.groupBy(col("scope"))
        .agg(sum(expr("bitmap_count(bmp)")).as("n_distinct"))
      val global = bm.groupBy(col("b"))
        .agg(expr("bitmap_or_agg(bmp)").as("bmor"))
        .agg(sum(expr("bitmap_count(bmor)")).as("n_distinct"))
        .select(lit("TOTAL").as("scope"), col("n_distinct"))
      monthly.unionAll(global)
    },
    Some(
      """SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS scope,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT 'TOTAL', CAST(count(DISTINCT o_custkey) AS BIGINT)
        |FROM orders""".stripMargin))

  /** q144 — VARIANT semi-structured extraction (Spark 4's native
    * answer to schemaless JSON columns): `parse_json` shreds the props
    * string into the binary VARIANT encoding ONCE, then typed
    * `try_variant_get` paths read it without re-parsing — the
    * engine-current replacement for q34's per-access get_json_object
    * string parse (at 100 TB the parse happens once per row instead of
    * once per extracted field, and the binary form column-prunes).
    * Same aggregate contract as q34, so the oracle is the identical
    * JSON SQL — hash-green proves the VARIANT path loses nothing. */
  val q144 = Q("q144_variant_extract",
    (s, d) => Catalog.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k",
        expr("try_variant_get(v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k")),
    Some(
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin))

  /** q145 — XML round trip (Spark 4 ships the XML source natively —
    * rowTag read/write, schema projection): the remaining
    * interchange-format sink beyond CSV/JSON/ORC/parquet. Same
    * identity-projection verification as q38/q39: hash-green proves
    * the write → read cycle preserves every row and type. */
  val q145 = Q("q145_xml_roundtrip",
    (s, d) => {
      val out = s"/tmp/graft_xml/${java.nio.file.Paths.get(d).getFileName}/nation_xml"
      Catalog.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .coalesce(1).write.mode("overwrite")
        .format("xml").option("rootTag", "nations").option("rowTag", "nation")
        .save(out)
      s.read.format("xml").option("rowTag", "nation").load(out)
        .select(col("n_nationkey").cast("bigint"), col("n_name"),
          col("n_regionkey").cast("bigint"))
    },
    Some(
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin))

  /** q146 — LATERAL correlated subquery (SQL top-n-per-group): for
    * each nation, the 3 highest-balance customers via a per-row
    * LATERAL derived table — the relational spelling of
    * [[graft.plans.TopKPerGroup]], issued through the SQL front door.
    * Catalyst decorrelates the lateral into a ranked window (no
    * per-nation re-execution), so the plan is the same keyed
    * window/top-k shape as q70 — the feature under test is the SQL
    * surface, not a new physical path. */
  val q146 = Q("q146_lateral_topn",
    (s, d) => {
      Catalog.nation(s, d).createOrReplaceTempView("nation_v")
      Catalog.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.acct_cents
          |FROM nation_v n,
          |LATERAL (SELECT c.c_custkey,
          |           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_cents
          |         FROM customer_v c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY acct_cents DESC, c.c_custkey LIMIT 3) t""".stripMargin)
    },
    Some(
      """SELECT n.n_name, t.c_custkey, t.acct_cents
        |FROM nation n,
        |LATERAL (SELECT c.c_custkey,
        |           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_cents
        |         FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY acct_cents DESC, c.c_custkey LIMIT 3) t""".stripMargin))

  /** q147 — COLLATION-AWARE comparison (Spark 4 string collations):
    * case-insensitive segment membership expressed by comparing under
    * the UTF8_LCASE collation — the engine-native form of the
    * lower()-both-sides idiom. Deliberately a map-side PREDICATE, not
    * a join key: Spark 4.1 plans collated-key joins as sort-merge
    * ONLY (hash joins don't support collation-aware equality yet —
    * verified empirically: even an explicit broadcast hint on a 3-row
    * dim is ignored and the fact gets sorted), so at scale the
    * lower()-normalized equi-join (J13, q09's shape) remains the join
    * formulation and collation belongs in per-row predicates and
    * ORDER BY, where it stays codegen'd with no plan penalty. The
    * oracle spells the same predicate with lower(). */
  val q147 = Q("q147_collated_predicate",
    (s, d) => Catalog.customer(s, d)
      .filter(collate(col("c_mktsegment"), "UTF8_LCASE")
        .isin("building", "automobile", "machinery"))
      .groupBy(col("c_mktsegment").cast("string").as("segment"))
      .agg(count(lit(1)).as("n")),
    Some(
      """SELECT c_mktsegment AS segment, count(*) AS n
        |FROM customer
        |WHERE lower(c_mktsegment) IN ('building', 'automobile', 'machinery')
        |GROUP BY 1""".stripMargin))

  /** q148 — RECURSIVE CTE (Spark 4 ships WITH RECURSIVE natively): an
    * ancestry walk up a derived referral chain (parent = custkey/2),
    * emitting each customer's depth to the root — the iterate-until-
    * fixpoint shape expressed relationally, where q61's connected
    * components hand-rolls the loop in Scala for cyclic inputs.
    * Recursion depth is O(log maxkey) — bounded, acyclic by
    * construction (the chain strictly decreases), well inside Spark's
    * recursion limit. DuckDB runs the identical recursive SQL. */
  val q148 = Q("q148_recursive_cte",
    (s, d) => {
      Catalog.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """WITH RECURSIVE up(custkey, anc, depth) AS (
          |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer_v
          |  UNION ALL
          |  SELECT custkey, anc div 2, depth + 1 FROM up WHERE anc > 0)
          |SELECT custkey, max(depth) AS depth_to_root
          |FROM up GROUP BY custkey""".stripMargin)
    },
    Some(
      """WITH RECURSIVE up(custkey, anc, depth) AS (
        |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT custkey, anc // 2, depth + 1 FROM up WHERE anc > 0)
        |SELECT custkey, max(depth) AS depth_to_root
        |FROM up GROUP BY custkey""".stripMargin))

  /** q149 — TYPED COGROUP reconciliation: per-order comparison of the
    * order header's total against the sum of its line items, written
    * as `KeyValueGroupedDataset.cogroup` — the typed two-sided
    * per-key API (the Dataset face of a co-partitioned merge; both
    * sides shuffle once on the key and each key's row groups meet in
    * ONE function call, the shape custom per-key business logic takes
    * when it genuinely can't be a join+agg). The arithmetic stays in
    * exact cents; the oracle is the equivalent outer join + group —
    * hash-green proves the imperative per-key path computes exactly
    * what the relational one does. */
  val q149 = Q("q149_cogroup_reconcile",
    (s, d) => {
      import s.implicits._
      val orders = Catalog.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("bigint").as("o_cents"))
        .as[(Long, Long)]
      val items = Catalog.lineitem(s, d)
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("bigint").as("cents"))
        .as[(Long, Long)]
      orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
        (k, os, ls) =>
          val oList = os.toList
          if (oList.isEmpty) Iterator.empty // FK orphan — no header
          else {
            var n = 0L; var sum = 0L
            ls.foreach { l => n += 1; sum += l._2 }
            Iterator((k, oList.head._2, sum, n))
          }
      }.toDF("o_orderkey", "o_cents", "item_cents", "n_items")
    },
    Some(
      """SELECT o.o_orderkey,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_cents,
        |       CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100)
        |         AS BIGINT)), 0) AS BIGINT) AS item_cents,
        |       CAST(count(l.l_orderkey) AS BIGINT) AS n_items
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2""".stripMargin))

  /** q158 — ROLLUP HIERARCHY AGGREGATION: revenue cents at
    * (region, nation), (region), and grand-total levels in ONE pass —
    * the reporting-cube shape warehouses run nightly. Spark's
    * `rollup` plans a single Expand + one aggregation (the subtotal
    * levels replicate rows map-side, never re-scan); `grouping_id`
    * disambiguates NULL-as-subtotal from NULL data. Exact cents only.
    * Names are COALESCEd to sentinels so the hash gate sees identical
    * strings for subtotal rows in both engines. */
  val q158 = Q("q158_rollup_revenue",
    (s, d) => Catalog.customer(s, d)
      .join(Catalog.nation(s, d),
        col("c_nationkey") === col("n_nationkey"))
      .join(Catalog.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(round(col("c_acctbal") * 100).cast("bigint")).as("bal_cents"),
        grouping_id().cast("bigint").as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("bal_cents"), col("gid")),
    Some(
      """SELECT COALESCE(r.r_name, 'ALL') AS region,
        |       COALESCE(n.n_name, 'ALL') AS nation,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))
        |         AS BIGINT) AS bal_cents,
        |       CAST(grouping(r.r_name) * 2 + grouping(n.n_name)
        |         AS BIGINT) AS gid
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)""".stripMargin))

  /** q159 — PIVOT TO WIDE: per-user event counts and purchase cents
    * spread across the five event types as columns — the
    * feature-vector/reporting reshape. Spark's `pivot` with an
    * EXPLICIT value list (never the implicit distinct scan — that is a
    * whole extra job at 100 TB and a nondeterministic column order)
    * plans as one map-side-combinable aggregation with conditional
    * aggregates; the oracle is the equivalent explicit CASE roll-up —
    * wide reshapes stay one pass in both engines. */
  val q159 = Q("q159_pivot_events",
    (s, d) => Catalog.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").cast("bigint").as("n_click"),
        col("error").cast("bigint").as("n_error"),
        col("purchase").cast("bigint").as("n_purchase"),
        col("signup").cast("bigint").as("n_signup"),
        col("view").cast("bigint").as("n_view")),
    Some(
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view
        |FROM events GROUP BY 1""".stripMargin))

  /** q160 — RANGE-FRAME SLIDING WINDOW: each event's trailing
    * 15-minute activity (count + cents) for the SAME user — a
    * value-range frame (`RANGE BETWEEN`), not a row-count frame: the
    * frame is defined by timestamp distance, so burst density is what
    * the number measures. One keyed window on (user, time order) over
    * integer micros — exact, and the partition-and-sort-once shape at
    * scale. */
  val q160 = Q("q160_range_frame_activity",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-15L * 60 * 1000000, 0L)
      Catalog.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_15m"),
          sum(col("cents")).over(w).as("cents_15m"))
    },
    Some(
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  CAST(count(*) OVER w AS BIGINT) AS n_15m,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
        |    AS BIGINT) AS cents_15m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW)
        |""".stripMargin))

  val all: Seq[Q] =
    Seq(q26, q27, q28, q29, q30, q31, q32, q34, q35, q37, q38, q39, q40,
      q54, q64, q65, q69, q72, q73, q74, q76, q92, q95, q105, q106, q107,
      q111, q112, q116, q126, q130, q135, q144, q145, q146, q147, q148,
      q149, q158, q159, q160)
}
