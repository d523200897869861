package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ITERATIVE GRAPH COMPUTE — PageRank as repeated key-partitioned
  * joins, the companion to Dedup.connectedComponents' label
  * propagation. Each iteration is one edges⋈ranks join + one groupBy —
  * both shuffle on the node key, so at scale the edge relation is
  * pre-partitioned once (persisted here) and every iteration reuses
  * that layout; nothing is ever collected to the driver.
  *
  * Determinism contract (what makes this ORACLE-VERIFIABLE, unlike
  * textbook double-valued PageRank whose FP sums depend on partition
  * order): ranks are integer micro-units (1.0 → 1 000 000) and every
  * step is integer arithmetic — contribution = rank div outdeg, damping
  * = (85·Σ) div 100 — so sums are exact longs and the result is
  * bit-identical however the data is partitioned. Dangling-node mass is
  * dropped (the standard simplified formulation).
  *
  * For iteration counts beyond a handful, checkpoint `ranks` every few
  * rounds to truncate lineage; at 3 iterations the plan stays small.
  */
object PageRank {

  /** `edges`: directed (src BIGINT, dst BIGINT), pre-deduplicated.
    * Returns (node, rank) over nodes = src ∪ dst. */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    // only the two relations REUSED each iteration are persisted; the
    // raw edge list is consumed once building each, and caching it
    // would just double the memory footprint
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(m, 0L)) div 100"))
            .cast("bigint").as("rank"))
    }
    ranks
  }
}
