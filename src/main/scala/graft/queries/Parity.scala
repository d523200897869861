package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.Forex
import graft.ops.Normalize
import graft.tables.Catalog

/** Reference-parity operator queries (SURVEY.md §2) over the driver
  * testdata. Each query is deterministic and paired with a DuckDB
  * oracle on the same tables.
  *
  * The testdata has no nulls or duplicate rows (FIXTURES.md), so the
  * null-handling / dedup operators inject messiness *deterministically
  * via expressions* — the identical derivation appears in the oracle
  * SQL, so the oracle defines the contract (SURVEY §7.4.1).
  */
object Parity {

  /** The "messy CSV" stand-in (FIXTURES.md B4): customer with
    * deterministically injected nulls (numeric + string column) and
    * duplicate rows, mixed-case headers. */
  private def messyCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.customer(spark, dir)
    val base = c.select(
      col("c_custkey").as("ID"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_name")).as("Name"),
      when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal")).as("AcctBal"),
      col("c_mktsegment").as("Segment"))
    base.unionAll(base.filter(col("ID") % 3 === 0))
  }

  private val messySql =
    """SELECT c_custkey AS id,
      |       CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS name,
      |       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS acctbal,
      |       c_mktsegment AS segment
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END,
      |       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END, c_mktsegment
      |FROM customer WHERE c_custkey % 3 = 0""".stripMargin

  /** q01 — file-1 pipeline parity (P1 lowercase rename, P2 fillna,
    * D1 exact dedup; ref py:3-18). */
  val q01 = Q(
    "q01_normalize_dedup",
    (s, d) => Normalize.run(messyCustomer(s, d)),
    Some(
      s"""SELECT DISTINCT id, coalesce(name, '0') AS name,
         |       coalesce(acctbal, 0) AS acctbal, segment
         |FROM ($messySql)""".stripMargin))

  /** q02 — duplicate count (A5; ref py:9 `df.duplicated().sum()`),
    * one-pass groupBy form. */
  val q02 = Q(
    "q02_dup_count",
    (s, d) => Normalize.duplicateCountDF(messyCustomer(s, d)),
    Some(
      s"""WITH m AS ($messySql)
         |SELECT (SELECT count(*) FROM m)
         |     - (SELECT count(*) FROM (SELECT DISTINCT * FROM m)) AS dup_count""".stripMargin))

  /** q03 — grouped aggregation with filter pushdown (A3-style; the
    * engine's TPC-H-Q1-shaped smoke). Decimal casts keep sums exact and
    * engine-portable (no FP accumulation order). */
  val q03 = Q(
    "q03_pricing_summary",
    (s, d) => {
      val li = Catalog.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },
    Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** q04 — delta-offset scalar (P6/A1; ref sql:10-20): MAX(cdc_ts) −
    * lookback with IFNULL fallback to minimum_date. */
  val q04 = Q(
    "q04_delta_offset",
    (s, d) =>
      Catalog.events(s, d).agg(
        coalesce(
          max(col("ts")) - expr("INTERVAL 30 DAYS"),
          lit("2020-01-01 00:00:00").cast("timestamp")).as("delta_offset")),
    Some(
      """SELECT coalesce(max(CAST(ts AS TIMESTAMP)) - INTERVAL 30 DAY,
        |                TIMESTAMP '2020-01-01 00:00:00') AS delta_offset
        |FROM events""".stripMargin))

  private val forexSql =
    """SELECT o_orderpriority AS from_currency,
      |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cal_year,
      |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS cal_month,
      |       max(CAST(o_totalprice AS DECIMAL(18,2))) AS conversion_rate
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  /** Output hygiene: cal_* to bigint and — critically — the decimal rate
    * to double. The driver's compare stringifies cells after the oracle
    * side loses decimal-ness, so `444718.30` (decimal) vs `444718.3`
    * (double) hash-mismatch; final outputs must never carry DecimalType
    * (compute exact in decimal, cast the *result* to double). */
  private def castCals(df: DataFrame): DataFrame =
    df.withColumn("cal_year", col("cal_year").cast("bigint"))
      .withColumn("cal_month", col("cal_month").cast("bigint"))
      .withColumn("conversion_rate", col("conversion_rate").cast("double"))

  /** q05 — latest-rate argmax, CTE-faithful 4-step chain
    * (A2; ref sql:42-58). */
  val q05 = Q(
    "q05_forex_latest_cte",
    (s, d) => castCals(Forex.latestCte(s, d)),
    Some(
      s"""WITH forex AS ($forexSql),
         |years AS (SELECT from_currency AS y_currency, max(cal_year) AS y_year
         |          FROM forex GROUP BY 1),
         |months AS (SELECT from_currency AS m_currency, cal_year AS m_year,
         |                  max(cal_month) AS m_month
         |           FROM forex JOIN years
         |             ON from_currency = y_currency AND cal_year = y_year
         |           GROUP BY 1, 2)
         |SELECT from_currency, cal_year, cal_month,
         |       CAST(conversion_rate AS DOUBLE) AS conversion_rate
         |FROM forex JOIN months
         |  ON from_currency = m_currency AND cal_year = m_year AND cal_month = m_month""".stripMargin))

  /** q06 — same semantics as q05 via a single window argmax (the
    * idiomatic Spark plan: one shuffle; SURVEY §2.4 A2 / §2.7). */
  val q06 = Q(
    "q06_forex_latest_window",
    (s, d) => castCals(Forex.latestWindow(s, d)),
    Some(
      s"""WITH forex AS ($forexSql),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY from_currency
         |            ORDER BY cal_year DESC, cal_month DESC, conversion_rate DESC) AS rn
         |  FROM forex)
         |SELECT from_currency, cal_year, cal_month,
         |       CAST(conversion_rate AS DOUBLE) AS conversion_rate
         |FROM ranked WHERE rn = 1""".stripMargin))

  /** q07 — China forex variant with the 2-digit-year quirk
    * (ref sql:116-162, :124; SURVEY §7.4.4). CURRENT_DATE() is replaced
    * by a data-derived as-of date for determinism (SURVEY §7.4.2). */
  val q07 = Q(
    "q07_forex_china_variant",
    (s, d) => {
      val asOf = Catalog.orders(s, d)
        .agg(max(to_date(col("o_orderdate")))).first().getDate(0).toString
      Forex.chinaCurrentMonth(s, d, asOf)
        .withColumn("cal_year", col("cal_year").cast("bigint"))
        .withColumn("conversion_rate", col("conversion_rate").cast("double"))
    },
    Some(
      s"""WITH forex AS ($forexSql),
         |asof_d AS (SELECT max(CAST(o_orderdate AS DATE)) AS d FROM orders)
         |SELECT from_currency, max(cal_year) AS cal_year,
         |       CAST(conversion_rate AS DOUBLE) AS conversion_rate
         |FROM forex, asof_d
         |WHERE cal_month = EXTRACT(month FROM d)
         |  AND cal_year % 100 = CAST(strftime(d, '%y') AS BIGINT)
         |GROUP BY from_currency, conversion_rate""".stripMargin))

  /** q33 — the real CSV round trip (S1/S2, ref py:3-4,17-18): dump the
    * messy relation to a CSV file (mixed-case headers, empty-field
    * nulls, duplicate rows), read it back with header+schema inference,
    * and run the file-1 pipeline on it. The oracle recomputes from the
    * PARQUET source (same SQL as q01) — so any loss in the CSV hop
    * (quoting, null encoding, type inference, float round-trip) would
    * surface as a mismatch. The CSV itself lives under a per-sf scratch
    * dir so concurrent scale factors never clobber each other. */
  val q33 = Q(
    "q33_csv_roundtrip",
    (s, d) => {
      val out = s"/tmp/graft_csv/${java.nio.file.Paths.get(d).getFileName}/customer_csv"
      messyCustomer(s, d).coalesce(1).write
        .option("header", "true").mode("overwrite").csv(out)
      val back = s.read.option("header", "true")
        .option("inferSchema", "true").csv(out)
      Normalize.run(back)
    },
    Some(
      s"""SELECT DISTINCT id, coalesce(name, '0') AS name,
         |       coalesce(acctbal, 0) AS acctbal, segment
         |FROM ($messySql)""".stripMargin))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q33)
}
