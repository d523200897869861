package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over integer-scaled embedding dimensions —
  * the trainable coarse quantizer for IVF search (the `label`-cell
  * stand-in's replacement). Everything is exact 64-bit integer math
  * except the round(mean) centroid update, whose single double divide +
  * round is IEEE-deterministic, so assignments are bit-identical across
  * engines and partitionings.
  *
  * Input `dims` is the exploded (vec_id, p, x) relation (x = 1e6-scaled
  * component, [[Similarity.intVec]]). Seeds are the first `k` vectors by
  * id — deterministic, no RNG. Ties in the nearest-centroid argmin break
  * by smallest centroid id.
  *
  * Scale shape (100 TB): the centroid relation is k×dim rows — tiny — so
  * each Lloyd pass is (1) one broadcast join of dims against all k
  * centroids + a grouped exact integer sum: map-side, one shuffle of
  * N·k partial rows; (2) one grouped sum for the centroid update. The
  * centroids are COLLECTED between rounds (k×dim rows, the one sanctioned
  * driver materialization) and re-broadcast, truncating the lineage so
  * pass i+1 never re-runs pass i — the same structure as distributed
  * Lloyd in MLlib, minus the RNG.
  */
object KMeans {

  /** (vec_id, cid, d2) after `iters` assignment passes (d2 = exact
    * squared integer distance to the winning centroid). */
  def assign(dims: DataFrame, k: Long, iters: Int): DataFrame = {
    require(iters >= 1)
    val spark = dims.sparkSession
    import spark.implicits._

    // k×dim rows → driver and back: re-broadcast as a literal relation so
    // each Lloyd round starts from materialized centroids, not lineage.
    def materialize(cent: DataFrame): DataFrame =
      spark.createDataset(
        cent.select(col("cid"), col("p").cast("int"), col("c"))
          .as[(Long, Int, Long)].collect().toSeq.sorted)
        .toDF("cid", "p", "c")

    def assignTo(cent: DataFrame): DataFrame =
      dims.join(broadcast(cent), "p")
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))

    var cent = materialize(dims.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("p"), col("x").as("c")))
    var asg = assignTo(cent)
    for (_ <- 2 to iters) {
      // round(mean) keeps centroids integer → next pass stays exact.
      // An emptied cluster simply drops out of the relation.
      cent = materialize(dims.join(asg.select("vec_id", "cid"), "vec_id")
        .groupBy(col("cid"), col("p"))
        .agg(round(sum(col("x")).cast("double") / count(lit(1)))
          .cast("bigint").as("c")))
      asg = assignTo(cent)
    }
    asg
  }
}
