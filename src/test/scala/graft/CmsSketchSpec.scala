package graft

import org.apache.spark.sql.functions._

import graft.functions.CmsSketch
import graft.tables.Catalog

class CmsSketchSpec extends SparkSuite {

  private val eps = 1e-4
  private val conf = 0.999
  private val seed = 7

  /** Build per-group sketches at `parts` partitions, merge to one, and
    * probe every distinct nation key. */
  private def estimates(parts: Int): Map[Long, Long] = {
    val c = Catalog.customer(spark, sf).repartition(parts)
      .withColumn("k", col("c_nationkey").cast("bigint"))
    val grouped = c.groupBy(col("k") % 4)
      .agg(count_min_sketch(col("k"),
        lit(eps), lit(conf), lit(seed)).as("sk"))
    val merged = grouped.agg(CmsSketch.merge(col("sk"), eps, conf, seed).as("sk"))
    val keys = Catalog.customer(spark, sf)
      .select(col("c_nationkey").cast("bigint").as("k")).distinct()
    keys.crossJoin(broadcast(merged))
      .select(col("k"), CmsSketch.estimate(col("sk"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("merged estimates never underestimate and are partitioning-invariant") {
    val exact = Catalog.customer(spark, sf)
      .groupBy(col("c_nationkey").cast("bigint")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val e1 = estimates(1)
    val e7 = estimates(7) // forces partial buffers + serialize/merge
    assert(e1 == e7, "estimate depends on physical partitioning")
    exact.foreach { case (k, n) =>
      assert(e1(k) >= n, s"CMS underestimated key $k: ${e1(k)} < $n")
      assert(e1(k) <= n + math.ceil(eps * total).toLong,
        s"CMS bound violated for key $k: ${e1(k)} > $n + eps*N")
    }
  }

  test("cms_merge and cms_estimate work through the SQL front door") {
    graft.functions.CmsSketch.register(spark.sessionState.functionRegistry)
    Catalog.registerViews(spark, sf)
    val rows = spark.sql(
      s"""WITH monthly AS (
         |  SELECT month(o_orderdate) AS m,
         |    count_min_sketch(o_custkey, ${eps}d, ${conf}d, $seed) AS sk,
         |    count(*) AS n
         |  FROM orders GROUP BY 1),
         |merged AS (
         |  SELECT cms_merge(sk, ${eps}d, ${conf}d, $seed) AS sk,
         |    sum(n) AS total FROM monthly),
         |top AS (
         |  SELECT o_custkey, count(*) AS exact_n FROM orders
         |  GROUP BY 1 ORDER BY exact_n DESC, o_custkey LIMIT 10)
         |SELECT t.o_custkey, t.exact_n,
         |  cms_estimate(m.sk, t.o_custkey) AS est, m.total
         |FROM top t CROSS JOIN merged m""".stripMargin).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2); val total = r.getLong(3)
      assert(est >= exact && est <= exact + math.ceil(eps * total).toLong)
    }
  }
}
