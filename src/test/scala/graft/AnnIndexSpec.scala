package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, KMeans, Similarity}
import graft.tables.Catalog

/** The persistent IVF index: build/append bookkeeping, probe parity
  * with its own definition, and drift-triggered retraining. */
class AnnIndexSpec extends SparkSuite {

  private val idx = "/tmp/graft_ann_spec/idx"

  private def vecs = Catalog.embeddings(spark, sf)
    .select(col("vec_id"), Similarity.intVec(col("embedding")).as("iv"))

  test("build + appendDelta index every vector exactly once") {
    val hist = vecs.filter(col("vec_id") < 400)
    val delta = vecs.filter(col("vec_id") >= 400)
    AnnIndex.build(spark, hist, k = 8, iters = 2, idx)
    AnnIndex.appendDelta(spark, idx, delta)
    val asg = spark.read.parquet(s"$idx/assign")
    assert(asg.count() == vecs.count())
    assert(asg.select(col("vec_id")).distinct().count() == vecs.count())
    // delta rows were assigned to the STORED centroids — recomputing
    // the literal projection gives identical cells
    val cent = AnnIndex.readCentroids(spark, idx)
    val expect = KMeans.assignToCentroids(delta, cent)
      .select(col("vec_id"), col("cid"))
    val got = asg.filter(col("vec_id") >= 400)
    assert(got.except(expect).count() == 0 &&
      expect.except(got).count() == 0)
  }

  test("streaming maintenance reaches batch-append parity and survives restart") {
    val base = "/tmp/graft_ann_spec/stream"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val idxS = s"$base/idx"
    val hist = vecs.filter(col("vec_id") < 400)
    val delta = vecs.filter(col("vec_id") >= 400)
    AnnIndex.build(spark, hist, k = 8, iters = 2, idxS)
    // the "arriving" embeddings: delta rows staged as a stream source
    Catalog.embeddings(spark, sf).filter(col("vec_id") >= 400)
      .write.parquet(s"$base/src")
    graft.streaming.StreamingAnn.maintain(spark, s"$base/src", idxS)
    // parity: streamed assignments == the batch literal projection
    val got = spark.read.parquet(s"$idxS/assign")
      .filter(col("vec_id") >= 400)
    val expect = KMeans.assignToCentroids(delta,
      AnnIndex.readCentroids(spark, idxS))
      .select(col("vec_id"), col("cid"))
    assert(got.except(expect).count() == 0 &&
      expect.except(got).count() == 0)
    // restart with no new files: checkpoint prevents double-append
    graft.streaming.StreamingAnn.maintain(spark, s"$base/src", idxS)
    assert(spark.read.parquet(s"$idxS/assign").count() ==
      hist.count() + delta.count())
  }

  test("maintain(): rebuilds on skew, no-op when balanced") {
    AnnIndex.build(spark, vecs, k = 8, iters = 2, idx)
    val before = AnnIndex.readCentroids(spark, idx)
    val share = AnnIndex.maxCellShare(spark, idx)
    assert(share > 0.0 && share <= 1.0)
    // threshold above the observed share → healthy, untouched
    assert(!AnnIndex.maintain(spark, idx, vecs, 8, 2, maxShare = 1.0))
    assert(AnnIndex.readCentroids(spark, idx) == before)
    // threshold below → drifted, rebuilt from the current corpus
    assert(AnnIndex.maintain(spark, idx, vecs, 8, 2,
      maxShare = share - 0.001))
    assert(spark.read.parquet(s"$idx/assign").count() == vecs.count())
  }
}
