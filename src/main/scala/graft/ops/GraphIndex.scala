package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Persistent k-NN-graph index — the stored-index lifecycle a real
  * graph ANN deployment has (the graph sibling of [[AnnIndex]]):
  * build once over the corpus, persist the edge relation, absorb
  * appends with [[KnnGraph.maintain]]'s delta-proportional joins
  * (never a rebuild), answer queries by traversing the STORED edges.
  *
  * Storage is one parquet relation (u, v) under `path`/edges.
  * Maintenance rewrites it via a staged write + rename-aside publish
  * (the engine's staged-swap idiom): the maintained edges are written
  * next to the live relation, the live dir is renamed aside
  * (`edges__old`), staging renamed in, and only then is the old
  * generation deleted — a crash at any step leaves at least one
  * complete generation on disk, and [[readEdges]] recovers the
  * aside generation if the crash hit between the two renames.
  * (A concurrent reader that planned over the old directory can
  * still see it vanish mid-scan; fully lock-free concurrency wants
  * versioned edge dirs behind a pointer file — [[graft.ops.Snapshots]]
  * is that design where the engine needs it.)
  *
  * Scale note: the edge relation is k rows per vector — for 100 TB of
  * documents with 1e9 vectors and k=16 that is a ~16e9-row/two-column
  * table, well inside warehouse norms, partitionable by hash(u). */
object GraphIndex {

  private def edgePath(path: String) = s"$path/edges"
  private def stagingPath(path: String) = s"$path/edges__staging"
  private def oldPath(path: String) = s"$path/edges__old"

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** If a publish crashed between rename-aside and rename-in, the live
    * dir is missing but the aside generation survives — restore it.
    * Idempotent; called by every read and publish entry point. */
  private def recover(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val live = new Path(edgePath(path))
    val old = new Path(oldPath(path))
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
  }

  /** Build the graph over `vecs` and store its edges at `path`. */
  def build(spark: SparkSession, vecs: DataFrame, k: Int, rounds: Int,
      bucketCols: Seq[String], path: String,
      nHint: Option[Long] = None): Unit =
    KnnGraph.build(vecs, k, rounds, bucketCols, nHint)
      .write.mode("overwrite").parquet(edgePath(path))

  def readEdges(spark: SparkSession, path: String): DataFrame = {
    recover(spark, path)
    spark.read.parquet(edgePath(path))
  }

  /** Absorb a delta: maintain against the stored edges, stage the
    * maintained relation, publish by rename-aside (never
    * delete-then-rename — a crash mid-publish must leave a complete
    * generation on disk). `all` must contain both generations with
    * the same shape [[KnnGraph.build]] takes. */
  def appendDelta(spark: SparkSession, path: String, all: DataFrame,
      isDelta: Column, k: Int, bucketCols: Seq[String]): Unit = {
    val maintained =
      KnnGraph.maintain(all, readEdges(spark, path), isDelta, k, bucketCols)
    maintained.write.mode("overwrite").parquet(stagingPath(path))
    val fs = fsOf(spark, path)
    val live = new Path(edgePath(path))
    val old = new Path(oldPath(path))
    val stg = new Path(stagingPath(path))
    fs.delete(old, true) // leftover from a crash after a prior swap-in
    if (!fs.rename(live, old))
      throw new IllegalStateException(
        s"graph index publish failed: cannot set aside ${edgePath(path)}")
    if (!fs.rename(stg, live)) {
      fs.rename(old, live) // roll the live generation back
      throw new IllegalStateException(
        s"graph index swap failed: ${stagingPath(path)} -> ${edgePath(path)}")
    }
    fs.delete(old, true)
  }

  /** Ensure the index at `path` reflects (`stamp`, k, rounds,
    * bucketCols): if the stored meta matches, the index is current
    * and NOTHING runs — construction amortizes across sessions, which
    * is the point of persisting an index. Otherwise run the full
    * protocol (build over history, absorb the delta, stamp). `stamp`
    * must identify the input data generation (e.g. source path +
    * file mtime) — a stale stamp after a data refresh forces the
    * rebuild. Deterministic: the stored content is a pure function of
    * (data, params), so reuse can never change a query's result. */
  def ensure(spark: SparkSession, path: String, all: DataFrame,
      isDelta: Column, k: Int, rounds: Int, bucketCols: Seq[String],
      stamp: String, nHint: Option[Long] = None): Unit = {
    recover(spark, path)
    val fs = fsOf(spark, path)
    val metaP = new Path(s"$path/meta.json")
    val want = s"""{"stamp":"$stamp","k":$k,"rounds":$rounds,""" +
      s""""buckets":"${bucketCols.mkString(",")}"}"""
    val have =
      if (!fs.exists(metaP)) ""
      else {
        val in = fs.open(metaP)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
    if (have == want && fs.exists(new Path(edgePath(path)))) return
    fs.delete(metaP, false)
    build(spark, all.filter(!isDelta), k, rounds, bucketCols, path, nHint)
    appendDelta(spark, path, all, isDelta, k, bucketCols)
    val out = fs.create(metaP, true)
    try out.write(want.getBytes("UTF-8")) finally out.close()
  }

  /** Search the STORED graph: [[KnnGraph.search]] over the persisted
    * edge relation. */
  def search(spark: SparkSession, path: String, vecs: DataFrame,
      queryId: Long, beam: Int, topK: Int,
      bucketCols: Seq[String]): DataFrame =
    KnnGraph.search(vecs, readEdges(spark, path), queryId, beam, topK,
      bucketCols)

  /** Ensure a LAYERED index ([[KnnGraph.buildLayers]] — true HNSW
    * hierarchy, one (u, v, layer) relation) at `path`: same stamped
    * meta protocol as [[ensure]], with the layer geometry folded into
    * the meta so a parameter change forces the rebuild. */
  def ensureLayered(spark: SparkSession, path: String, vecs: DataFrame,
      k: Int, rounds: Int, bucketCols: Seq[String], levelMod: Long,
      levels: Int, stamp: String, nHint: Option[Long] = None): Unit = {
    recover(spark, path)
    val fs = fsOf(spark, path)
    val metaP = new Path(s"$path/meta.json")
    val want = s"""{"stamp":"$stamp","k":$k,"rounds":$rounds,""" +
      s""""buckets":"${bucketCols.mkString(",")}",""" +
      s""""levelMod":$levelMod,"levels":$levels}"""
    val have =
      if (!fs.exists(metaP)) ""
      else {
        val in = fs.open(metaP)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
    if (have == want && fs.exists(new Path(edgePath(path)))) return
    fs.delete(metaP, false)
    KnnGraph.buildLayers(vecs, k, rounds, bucketCols, levelMod, levels,
        nHint)
      .write.mode("overwrite").parquet(edgePath(path))
    val out = fs.create(metaP, true)
    try out.write(want.getBytes("UTF-8")) finally out.close()
  }

  /** Greedy-descent search over the STORED layered relation. */
  def searchLayered(spark: SparkSession, path: String, vecs: DataFrame,
      queryId: Long, beam: Int, topK: Int, levelMod: Long,
      levels: Int): DataFrame =
    KnnGraph.searchLayers(vecs, readEdges(spark, path), queryId, beam,
      topK, levelMod, levels)
}
