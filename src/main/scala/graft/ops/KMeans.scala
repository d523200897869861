package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over integer-scaled embedding vectors —
  * the trainable coarse quantizer for IVF search (the `label`-cell
  * stand-in's replacement). Everything is exact 64-bit integer math
  * except the round(mean) centroid update, whose single double divide +
  * round is IEEE-deterministic, so assignments are bit-identical across
  * engines and partitionings.
  *
  * Input `vecs` is the (vec_id, iv) relation (iv = 1e6-scaled integer
  * vector, [[Similarity.intVec]]). Seeds are the first `k` vectors by
  * id — deterministic, no RNG. Ties in the nearest-centroid argmin break
  * by smallest centroid id (struct (d2, cid) min — lexicographic).
  *
  * Scale shape (100 TB): centroids are k×dim values — tiny — and are
  * COLLECTED between rounds (the one sanctioned driver materialization,
  * same structure as distributed Lloyd in MLlib minus the RNG), which
  * also truncates lineage so pass i+1 never re-runs pass i. They then
  * re-enter the plan as LITERAL arrays, making each assignment pass a
  * pure zero-shuffle projection: per row, k exact zip_with/aggregate
  * distances and one array_min argmin. (The previous formulation
  * broadcast-joined the dim-exploded relation against centroids —
  * N·dim·k intermediate rows and two keyed shuffles per pass; the
  * literal-projection form does the same exact arithmetic map-side.)
  * The centroid update is one explode + grouped sum per round, keyed on
  * (cid, p) — k·dim groups.
  */
object KMeans {

  /** (cid, p, c) rows → ordered per-centroid arrays on the driver —
    * the one sanctioned k×dim materialization (see scaladoc above). */
  def collectCentroids(df: DataFrame): Seq[(Long, Seq[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("cid"), col("p").cast("int"), col("c"))
      .as[(Long, Int, Long)].collect().toSeq
      .groupBy(_._1).toSeq
      .map { case (cid, rows) => (cid, rows.sortBy(_._2).map(_._3)) }
      .sortBy(_._1)
  }

  /** One zero-shuffle assignment pass against FIXED centroids (driver
    * literals): per row, k exact zip_with distances + one array_min
    * argmin, ties to smallest cid. Public so a PERSISTED quantizer
    * ([[AnnIndex]]) can assign delta batches without retraining. */
  def assignToCentroids(vecs: DataFrame,
      cent: Seq[(Long, Seq[Long])]): DataFrame = {
    val cands = array(cent.map { case (cid, carr) =>
      struct(
        aggregate(
          zip_with(col("iv"), typedlit(carr), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v).as("d2"),
        lit(cid).as("cid"))
    }: _*)
    vecs.select(col("vec_id"), array_min(cands).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
  }

  /** Assignment against a trained codebook as a broadcast RELATION —
    * the large-k form. [[assignToCentroids]] plants k struct
    * expressions in ONE projection: ideal at IVF probe sizes (codegen
    * keeps everything in registers), fatal to planning/codegen at the
    * 10^4+ cells a past-the-clamp graph init needs. Here the codebook
    * broadcasts as a k-row relation; the nested-loop fan-out is N·k
    * rows but `min(struct)`'s partial aggregation folds them map-side,
    * so the one shuffle carries N rows. Same exact integer zip_with
    * arithmetic and (d2, cid) lexicographic tie-break — the two forms
    * are bit-identical (pinned by KnnGraphSpec). */
  def assignBroadcast(vecs: DataFrame,
      cent: Seq[(Long, Seq[Long])]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val centDf = cent.toDF("cid", "carr")
    vecs.select(col("vec_id"), col("iv"))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"), struct(
        aggregate(
          zip_with(col("iv"), col("carr"), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v).as("d2"),
        col("cid").as("cid")).as("m"))
      .groupBy(col("vec_id")).agg(min(col("m")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
  }

  /** Assignment with the codebook as ONE array<struct> literal and the
    * argmin FOLDED per row by `aggregate` — the large-k form that
    * actually scales. [[assignToCentroids]] plants k struct
    * expressions in the plan (planning/codegen dies at 10^4 cells);
    * [[assignBroadcast]] keeps the plan constant-size but materializes
    * the N·k row fan-out through a hash aggregate — measured r16 on a
    * 1M×977-cell leg, the per-row object churn of 10^9 intermediate
    * rows turns a ~1 min arithmetic pass into tens of minutes of CPU.
    * Here the k-loop is runtime DATA inside one projection: constant
    * plan size, zero shuffle, zero row fan-out — per row, k exact
    * zip_with distances folded to the (d2, cid)-lexicographic min.
    * Same arithmetic and tie-break as both other forms (spec-pinned
    * bit-identical); `struct(d2, cid) < acc` is Spark's lexicographic
    * struct ordering, strict, so the first (smallest-cid) minimum
    * wins — exactly min(struct)'s behavior. */
  def assignFolded(vecs: DataFrame,
      cent: Seq[(Long, Seq[Long])]): DataFrame = {
    val book = typedlit(cent) // array<struct<_1: cid, _2: carr>>
    val best = aggregate(
      book,
      struct(lit(Long.MaxValue).as("d2"), lit(Long.MaxValue).as("cid")),
      (acc, cb) => {
        val d2 = aggregate(
          zip_with(col("iv"), cb.getField("_2"),
            (x, c) => (x - c) * (x - c)),
          lit(0L), (a, v) => a + v)
        val cand = struct(d2.as("d2"), cb.getField("_1").as("cid"))
        when(cand < acc, cand).otherwise(acc)
      })
    vecs.select(col("vec_id"), col("iv"), best.as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
  }

  /** Assignment via the codegen'd native argmin
    * ([[graft.functions.NearestCell]]) — the SHIPPED large-k form.
    * [[assignFolded]] already has the right plan shape (constant plan
    * size, zero shuffle, zero row fan-out) but evaluates interpreted
    * higher-order functions at ≈5.9 µs/row·cell (PERF.md r16, 196
    * cells); here the same k·dim integer loop runs as one codegen'd
    * primitive pass with the codebook as flat reference arrays — same
    * arithmetic, same (d2, cid) tie-break, bit-identical to all three
    * composable forms (KnnGraphSpec pins the quad-form identity). */
  def assignCell(vecs: DataFrame,
      cent: Seq[(Long, Seq[Long])]): DataFrame =
    vecs.select(col("vec_id"),
        graft.functions.NearestCell(col("iv"), cent).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** Train a `k`-cell codebook over `train` (vec_id, iv) with `iters`
    * Lloyd passes and return the collected centroids, cids 0..k-1.
    * Seeds are the k vectors at id-rank [seedRank·k, (seedRank+1)·k)
    * in ascending vec_id — rank-based (sparse id spaces work), and
    * DISJOINT seed slices per `seedRank` give independent codebooks:
    * the multi-table trick for a trained-quantizer blocking key
    * ([[KnnGraph.withInitBuckets]]). Driver materialization is the
    * sanctioned k×dim codebook (+ the seed slice read once). Uses
    * [[assignCell]] for the training passes, so k is unbounded by
    * expression size, free of the N·k row fan-out, AND codegen'd. */
  def trainCodebook(train: DataFrame, k: Int, iters: Int,
      seedRank: Int = 0): Seq[(Long, Seq[Long])] = {
    require(k >= 1 && iters >= 1 && seedRank >= 0,
      s"trainCodebook: need k($k) >= 1, iters($iters) >= 1, " +
        s"seedRank($seedRank) >= 0")
    val seedRows = train.select(col("vec_id"), col("iv"))
      .orderBy(col("vec_id")).limit((seedRank + 1) * k)
      .collect().drop(seedRank * k)
    require(seedRows.length == k,
      s"trainCodebook: seed slice $seedRank needs ${(seedRank + 1) * k} " +
        s"vectors, corpus has only ${seedRank * k + seedRows.length}")
    var cent: Seq[(Long, Seq[Long])] = seedRows.zipWithIndex.map {
      case (r, i) => (i.toLong, r.getSeq[Long](1))
    }.toSeq
    for (_ <- 2 to iters) {
      val asg = assignCell(train, cent)
      cent = collectCentroids(
        train.join(asg.select("vec_id", "cid"), "vec_id")
          .select(col("cid"), posexplode(col("iv")))
          .groupBy(col("cid"), col("pos").as("p"))
          .agg(round(sum(col("col")).cast("double") / count(lit(1)))
            .cast("bigint").as("c")))
    }
    cent
  }

  /** (vec_id, cid, d2) after `iters` assignment passes (d2 = exact
    * squared integer distance to the winning centroid). */
  def assign(vecs: DataFrame, k: Long, iters: Int): DataFrame = {
    require(iters >= 1)

    def collectCent(df: DataFrame): Seq[(Long, Seq[Long])] =
      collectCentroids(df)

    def assignTo(cent: Seq[(Long, Seq[Long])]): DataFrame =
      assignToCentroids(vecs, cent)

    var cent = collectCent(vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), posexplode(col("iv")))
      .select(col("cid"), col("pos").as("p"), col("col").as("c")))
    require(cent.nonEmpty,
      s"no seed vectors: corpus has no vec_id < $k (assignment would " +
        "silently be NULL)")
    var asg = assignTo(cent)
    for (_ <- 2 to iters) {
      // round(mean) keeps centroids integer → next pass stays exact.
      // An emptied cluster simply drops out of the relation.
      cent = collectCent(vecs.join(asg.select("vec_id", "cid"), "vec_id")
        .select(col("cid"), posexplode(col("iv")))
        .groupBy(col("cid"), col("pos").as("p"))
        .agg(round(sum(col("col")).cast("double") / count(lit(1)))
          .cast("bigint").as("c")))
      asg = assignTo(cent)
    }
    asg
  }
}
