package graft

import graft.queries.LoadQueries

class BucketingSpec extends SparkSuite {

  /** With broadcast and AQE off, a non-bucketed orders⋈lineitem would
    * plan SMJ + two hashpartitioning exchanges under it. Bucketed, the
    * only exchange left in q85's whole plan is the 5-group rollup above
    * the join. */
  test("q85 joins bucketed tables with no exchange under the join") {
    val conf = spark.conf
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = LoadQueries.q85.run(spark, sf)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1, s"expected only the rollup exchange:\n$plan")
      assert(out.count() == 5)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("q94 scan carries a dynamic partition pruning subquery") {
    val out = LoadQueries.q94.run(spark, sf)
    out.collect() // force execution so AQE finalizes plans
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("bucketed aggregation on the bucket key is also exchange-free") {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q85 has registered the tables for this sf
      LoadQueries.q85.run(spark, sf).collect()
      val tag = java.nio.file.Paths.get(sf).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val agg = spark.table(s"graft_b_lineitem_$tag")
        .groupBy("l_orderkey").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
