package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GridCum

/** The keyed two-phase cumulative histogram (r19) must agree exactly
  * with the single-partition `sum OVER (ORDER BY v)` window it
  * replaced, in both directions, and its consumers (q189's keep
  * cutoff, q193's curriculum phases) must plan NO unkeyed window. */
class GridCumSpec extends SparkSuite {

  test("withCum equals the unkeyed-window reference, asc and desc") {
    val spk = spark
    import spk.implicits._
    val rnd = new scala.util.Random(19)
    // sparse values incl. negatives, count range exercising >1 partials
    val hist = Seq.fill(400)(rnd.nextInt(100000) - 50000).distinct
      .map(v => (v.toLong, rnd.nextInt(50) + 1L))
      .toDF("v", "c")
      .persist()
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("v"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (desc <- Seq(false, true)) {
      val order = if (desc) col("v").desc else col("v").asc
      val got = asMap(GridCum.withCum(hist, order, "c", "cum"))
      val want = asMap(hist.withColumn("cum",
        sum(col("c")).over(Window.orderBy(order))))
      assert(got == want, s"desc=$desc: keyed cum diverges")
    }
    hist.unpersist()
    ()
  }

  test("q189/q193 plan no unkeyed window (the cut grids were the last " +
      "unbounded single-task sorts)") {
    for (q <- Seq(graft.queries.TextQueries.q189,
        graft.queries.PipelineQueries.q193)) {
      val plan = q.run(spark, sf).queryExecution.optimizedPlan
      val unkeyed = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(unkeyed.isEmpty,
        s"${q.name} still plans ${unkeyed.size} unkeyed window(s):\n" +
          unkeyed.mkString("\n"))
    }
  }
}
