package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cumulative counts over a VALUE HISTOGRAM without an unkeyed window
  * (r19, VERDICT r18 #5). The quantile-threshold operators (q188's
  * CCNet buckets, q189's DSIR keep cutoff, q193's curriculum phases)
  * read their cutoffs off a grid of quantized scores: `cum(v) =
  * Σ_{w ≤ v} c(w)`. The direct `sum(c) OVER (ORDER BY v)` plans a
  * single-partition WindowExec — fine when the grid is provably tiny,
  * but q189's grid is a per-doc SUM of per-token micro-logs, so its
  * value range grows with document length and nothing bounds the one
  * task at 100 TB. This computes the identical cum with the
  * [[GlobalRank]] two-phase recipe (guide §2: per-partition partials +
  * broadcast offsets), keyed and parallel at every step:
  *
  *   1. range-repartition the histogram on the order key (parallel;
  *      width = spark.sql.shuffle.partitions, scale-parameterized);
  *   2. per-partition totals → prefix offsets via a broadcast
  *      non-equi self-join over the partition-count-sized totals
  *      relation (no window at all — [[GlobalRank]]'s offsets window,
  *      though bounded by cluster width, still plans SinglePartition);
  *   3. per-partition running sum (keyed window) + broadcast offset.
  *
  * The result is deterministic whatever the sampled range boundaries
  * are: histogram keys are unique, so `cum` is a pure function of the
  * data. The input is persisted so steps 2 and 3 see one partitioning
  * (grid-sized state, the [[GlobalRank]] convention).
  */
object GridCum {

  /** Appends `cumCol` = running sum of `cntCol` in `order` (pass
    * `col(v)` for ascending cum, `col(v).desc` for descending). The
    * histogram's order key must be unique per row (any groupBy result
    * is). */
  def withCum(hist: DataFrame, order: Column, cntCol: String,
      cumCol: String): DataFrame = {
    require(Seq("_pid", "_t", "_q", "_tq", "_off", cumCol)
        .forall(!hist.columns.contains(_)),
      "withCum() adds the cum column (and uses _pid/_t/_q/_tq/_off " +
        "internally); rename conflicting input columns first")
    val parts = hist.repartitionByRange(order)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ptot = parts.groupBy(col("_pid")).agg(sum(col(cntCol)).as("_t"))
    val off = ptot
      .join(broadcast(ptot.select(col("_pid").as("_q"), col("_t").as("_tq"))),
        col("_q") < col("_pid"), "left")
      .groupBy(col("_pid"))
      .agg(coalesce(sum(col("_tq")), lit(0L)).as("_off"))
    parts.join(broadcast(off), "_pid")
      .withColumn(cumCol,
        col("_off") + sum(col(cntCol)).over(
          Window.partitionBy(col("_pid")).orderBy(order)))
      .drop("_pid", "_off")
  }
}
