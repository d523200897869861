package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.tables.Catalog

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k as the exactness baseline, and an IVF-style two-stage search
  * (coarse cells → probe best cells → exact rerank) as the scale path.
  *
  * Scale shape (100 TB): brute force is one broadcast of the query vector
  * and a map-side scan (top-k via takeOrdered semantics — orderBy+limit
  * plans as TakeOrderedAndProject, no full sort). IVF shrinks the scan to
  * the probed cells: at N vectors / C cells with p probes the exact work
  * drops to ~N·p/C — the centroid pass is O(C) and broadcastable.
  * `label` stands in for the k-means cell id (the quantizer is pluggable).
  *
  * The integer-scaled vectors ([[Similarity.intVec]]) make every
  * aggregation an exact 64-bit sum — order-free, so the DuckDB oracle and
  * any Spark partitioning agree bit-for-bit.
  */
object SimilarityQueries {

  private val queryVecId = 0L
  private val probes = 2
  private val topK = 10

  private def intVecs(s: SparkSession, d: String): DataFrame =
    Catalog.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        Similarity.intVec(col("embedding")).as("iv"))

  private val intVecsSql =
    """SELECT vec_id, label,
      |       list_transform(embedding,
      |         x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS iv
      |FROM embeddings""".stripMargin

  /** q23 — brute-force cosine top-k against the query vector. */
  val q23 = Q("q23_similarity_topk_brute",
    (s, d) => {
      val e = intVecs(s, d)
        .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
      val q = e.filter(col("vec_id") === queryVecId)
        .select(col("iv").as("qiv"), col("nrm").as("qnrm"))
      e.filter(col("vec_id") =!= queryVecId)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          Similarity.cosineFrom(col("iv"), col("qiv"), col("nrm"), col("qnrm"))
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(topK)
    },
    Some(
      s"""WITH iv AS ($intVecsSql),
         |n AS (SELECT *, CAST(list_aggregate(list_transform(iv, x -> x * x),
         |        'sum') AS DOUBLE) AS nrm FROM iv),
         |q AS (SELECT iv AS qiv, nrm AS qnrm FROM n WHERE vec_id = $queryVecId)
         |SELECT vec_id, label,
         |  CAST(list_aggregate(list_transform(generate_series(1, 64),
         |    i -> iv[i] * qiv[i]), 'sum') AS DOUBLE) / sqrt(nrm * qnrm) AS cosine
         |FROM n, q WHERE vec_id <> $queryVecId
         |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))

  /** q24 — IVF search: per-cell integer centroids (round(mean)), probe
    * the `probes` best cells by centroid cosine, exact top-k inside.
    * Formulated over exploded (vec, dim) rows: every sum is an exact
    * integer aggregate, order-free in both engines. */
  val q24 = Q("q24_similarity_ivf",
    (s, d) => {
      // persisted: feeds norms/query/centroid/candidate/rerank stages —
      // without it the plan re-scans the parquet 16× (once per leaf)
      val dims = intVecs(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("iv")))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "x")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // norms / qdims / cent are each consumed TWICE below (qnrm +
      // final join; cdot + fine dot; cnrm + cdot) — left lazy, every
      // consumer re-runs the aggregation over the cached dims and pays
      // its own AQE stage-jobs (the q175 re-expansion shape, r19).
      // Pinned, each plans and runs ONCE; state is N norms rows,
      // 64 qdims rows, cells×64 centroid rows.
      val norms = dims.groupBy(col("vec_id"))
        .agg(sum(col("x") * col("x")).cast("double").as("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qdims = dims.filter(col("vec_id") === queryVecId)
        .select(col("p").as("qp"), col("x").as("qx"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qnrm = norms.filter(col("vec_id") === queryVecId)
        .select(col("nrm").as("qnrm"))

      // coarse: integer centroid per cell, cosine to query, top cells
      val cent = dims.groupBy(col("label"), col("p"))
        .agg(round(sum(col("x")).cast("double") / count(lit(1))).cast("bigint")
          .as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnrm = cent.groupBy(col("label"))
        .agg(sum(col("c") * col("c")).cast("double").as("cnrm"))
      val cdot = cent.join(broadcast(qdims), col("p") === col("qp"))
        .groupBy(col("label")).agg(sum(col("c") * col("qx")).cast("double").as("cdot"))
      val cells = cdot.join(cnrm, "label").crossJoin(broadcast(qnrm))
        .select(col("label"),
          (col("cdot") / sqrt(col("cnrm") * col("qnrm"))).as("cscore"))
        .orderBy(col("cscore").desc, col("label")).limit(probes)
        .select(col("label"))

      // fine: exact cosine inside the probed cells only
      val cand = dims.join(broadcast(cells), "label")
        .filter(col("vec_id") =!= queryVecId)
      val dot = cand.join(broadcast(qdims), col("p") === col("qp"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("x") * col("qx")).cast("double").as("dot"))
      dot.join(norms, "vec_id").crossJoin(broadcast(qnrm))
        .select(col("vec_id"), col("label"),
          (col("dot") / sqrt(col("nrm") * col("qnrm"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
    },
    Some(
      s"""WITH iv AS ($intVecsSql),
         |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
         |dims AS (SELECT vec_id, label, p, iv[p] AS x FROM iv, pos),
         |norms AS (SELECT vec_id, CAST(sum(x * x) AS DOUBLE) AS nrm
         |          FROM dims GROUP BY 1),
         |qdims AS (SELECT p AS qp, x AS qx FROM dims WHERE vec_id = $queryVecId),
         |qnrm AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = $queryVecId),
         |cent AS (SELECT label, p,
         |           CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |         FROM dims GROUP BY 1, 2),
         |cnrm AS (SELECT label, CAST(sum(c * c) AS DOUBLE) AS cnrm
         |         FROM cent GROUP BY 1),
         |cdot AS (SELECT label, CAST(sum(c * qx) AS DOUBLE) AS cdot
         |         FROM cent JOIN qdims ON p = qp GROUP BY 1),
         |cells AS (SELECT label
         |          FROM cdot JOIN cnrm USING (label), qnrm
         |          ORDER BY cdot / sqrt(cnrm * qnrm) DESC, label LIMIT $probes),
         |cand AS (SELECT d.* FROM dims d JOIN cells USING (label)
         |         WHERE vec_id <> $queryVecId),
         |dot AS (SELECT vec_id, label, CAST(sum(x * qx) AS DOUBLE) AS dot
         |        FROM cand JOIN qdims ON p = qp GROUP BY 1, 2)
         |SELECT vec_id, label, dot / sqrt(nrm * qnrm) AS cosine
         |FROM dot JOIN norms USING (vec_id), qnrm
         |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))

  /** q36 — q23's brute-force top-k through the NATIVE codegen'd
    * [[graft.functions.CosineScaled]] expression (fused scale+dot+norms,
    * no per-row intermediate arrays). Same oracle as q23: passing proves
    * the custom expression bit-equal to both the composable path and
    * DuckDB. */
  val q36 = Q("q36_similarity_topk_native",
    (s, d) => {
      graft.functions.CosineScaled.register(
        s.sessionState.functionRegistry)
      val e = Catalog.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val q = e.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("qemb"))
      e.filter(col("vec_id") =!= queryVecId)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          graft.functions.CosineScaled(col("embedding"), col("qemb"))
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(topK)
    },
    q23.oracle)

  /** q56 — LSH-bucketed ANN (the brief's "IVF or LSH-bucketed variant";
    * q24 is the IVF path): 4 deterministic pseudo-random hyperplanes
    * (integer weights from the md5-derived hash of 'hp|plane|dim'),
    * sign-bit bucket per vector, search = exact rerank within the
    * query's bucket. All sums are exact integers; 2^plane goes through
    * pow(2,·) cast bigint — exact in both engines for small exponents.
    *
    * Scale: signatures are one dims×hyperplanes join + two grouped
    * integer sums (map-side partial); the bucket equality then bounds
    * the exact work to ~N/2^planes vectors. */
  val q56 = Q("q56_similarity_ann_lsh",
    (s, d) => {
      val dims = intVecs(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("iv")))
        .select(col("vec_id"), col("label"),
          (col("pos") + 1).as("p"), col("col").as("x")) // 1-based: p salts the hash
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val planes = s.range(0, 4).select(col("id").as("pl"))
      val hyper = planes.crossJoin(
          s.range(1, 65).select(col("id").as("p")))
        .select(col("pl"), col("p"),
          (graft.ops.TextAnalysis.hash60(concat(lit("hp|"),
            col("pl").cast("string"), lit("|"), col("p").cast("string")))
            % 2001 - 1000).as("w"))
      val proj = dims.join(broadcast(hyper), "p")
        .groupBy(col("vec_id"), col("pl")).agg(sum(col("x") * col("w")).as("s"))
      // sig and norms are each consumed twice (qb + cand; qnrm + final
      // join) — pinned so the signature/norm aggregations run ONCE
      // instead of once per consumer (the q24/q68 treatment, r19)
      val sig = proj.groupBy(col("vec_id"))
        .agg(sum(when(col("s") > 0,
          pow(lit(2.0), col("pl")).cast("bigint")).otherwise(0L)).as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qb = sig.filter(col("vec_id") === queryVecId)
        .select(col("bucket").as("qbucket"))
      val cand = sig.crossJoin(broadcast(qb))
        .filter(col("bucket") === col("qbucket") && col("vec_id") =!= queryVecId)
        .select(col("vec_id"))

      val norms = dims.groupBy(col("vec_id"))
        .agg(sum(col("x") * col("x")).cast("double").as("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qdims = dims.filter(col("vec_id") === queryVecId)
        .select(col("p").as("qp"), col("x").as("qx"))
      val qnrm = norms.filter(col("vec_id") === queryVecId)
        .select(col("nrm").as("qnrm"))
      val dot = dims.join(broadcast(cand), "vec_id")
        .join(broadcast(qdims), col("p") === col("qp"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("x") * col("qx")).cast("double").as("dot"))
      dot.join(norms, "vec_id").crossJoin(broadcast(qnrm))
        .select(col("vec_id"), col("label"),
          (col("dot") / sqrt(col("nrm") * col("qnrm"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
    },
    Some(
      s"""WITH iv AS ($intVecsSql),
         |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
         |dims AS (SELECT vec_id, label, p, iv[p] AS x FROM iv, pos),
         |planes AS (SELECT unnest(generate_series(0, 3)) AS pl),
         |hyper AS (SELECT pl, p,
         |    CAST(('0x' || substr(md5('hp|' || CAST(pl AS VARCHAR) || '|'
         |      || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS w
         |  FROM planes, pos),
         |proj AS (SELECT d.vec_id, h.pl, sum(d.x * h.w) AS s
         |         FROM dims d JOIN hyper h ON d.p = h.p GROUP BY 1, 2),
         |sig AS (SELECT vec_id,
         |    CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, pl) AS BIGINT)
         |             ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY 1),
         |qb AS (SELECT bucket AS qbucket FROM sig WHERE vec_id = $queryVecId),
         |cand AS (SELECT s.vec_id FROM sig s, qb
         |         WHERE s.bucket = qb.qbucket AND s.vec_id <> $queryVecId),
         |norms AS (SELECT vec_id, CAST(sum(x * x) AS DOUBLE) AS nrm
         |          FROM dims GROUP BY 1),
         |qdims AS (SELECT p AS qp, x AS qx FROM dims WHERE vec_id = $queryVecId),
         |qnrm AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = $queryVecId),
         |dot AS (SELECT d.vec_id, d.label, CAST(sum(d.x * q.qx) AS DOUBLE) AS dot
         |        FROM dims d JOIN cand c ON d.vec_id = c.vec_id
         |        JOIN qdims q ON d.p = q.qp GROUP BY 1, 2)
         |SELECT vec_id, label, dot / sqrt(nrm * qnrm) AS cosine
         |FROM dot JOIN norms USING (vec_id), qnrm
         |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))

  /** q206 — MULTI-PROBE LSH ANN (Lv et al. 2007, PAPERS.md): q56's
    * sign-bit index probed at the query bucket PLUS the two
    * Hamming-distance-1 flips of the planes with the SMALLEST |query
    * projection| — the planes the query sits closest to, exactly where
    * near neighbors fall off the bucket. Same index, 3 of 16 buckets
    * probed instead of 1; the q153-family audit measures recall@10
    * jumping from 1 (single-probe q56) toward brute — multi-probe is
    * how LSH tables trade a constant probe factor for recall WITHOUT
    * growing the index. Probe ranking is deterministic (integer
    * projections, ties by plane id).
    *
    * Scale: identical to q56 plus a 3-row probe relation broadcast
    * into the bucket-equality join — candidate work is ~3·N/2^planes,
    * still bucket-bounded. */
  val q206 = Q("q206_multiprobe_lsh",
    (s, d) => {
      val dims = intVecs(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("iv")))
        .select(col("vec_id"), col("label"),
          (col("pos") + 1).as("p"), col("col").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val planes = s.range(0, 4).select(col("id").as("pl"))
      val hyper = planes.crossJoin(
          s.range(1, 65).select(col("id").as("p")))
        .select(col("pl"), col("p"),
          (graft.ops.TextAnalysis.hash60(concat(lit("hp|"),
            col("pl").cast("string"), lit("|"), col("p").cast("string")))
            % 2001 - 1000).as("w"))
      val proj = dims.join(broadcast(hyper), "p")
        .groupBy(col("vec_id"), col("pl")).agg(sum(col("x") * col("w")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = proj.groupBy(col("vec_id"))
        .agg(sum(when(col("s") > 0,
          pow(lit(2.0), col("pl")).cast("bigint")).otherwise(0L)).as("bucket"))
      // the probe set is 3 bounded values derived from the QUERY's 4
      // projections — computed driver-side (the bounded-collect
      // precedent: k×dim codebooks, 5-row centroid pulls) instead of a
      // window + union + cross-join cascade; at 100 TB this is still 4
      // longs over the wire
      val qproj = proj.filter(col("vec_id") === queryVecId)
        .select(col("pl"), col("s")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val qbucket = qproj.map { case (pl, sv) =>
        if (sv > 0) 1L << pl else 0L }.sum
      val flips = qproj.sortBy { case (pl, sv) => (math.abs(sv), pl) }
        .take(2).map { case (pl, _) => qbucket ^ (1L << pl) }
      val probeSet = (qbucket +: flips).distinct
      val cand = sig.filter(col("bucket").isin(probeSet: _*))
        .filter(col("vec_id") =!= queryVecId)
        .select(col("vec_id"))
      // norms is consumed twice (qnrm + final join) — pinned so the
      // aggregation runs ONCE (the q24/q68 treatment, r19)
      val norms = dims.groupBy(col("vec_id"))
        .agg(sum(col("x") * col("x")).cast("double").as("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qdims = dims.filter(col("vec_id") === queryVecId)
        .select(col("p").as("qp"), col("x").as("qx"))
      val qnrm = norms.filter(col("vec_id") === queryVecId)
        .select(col("nrm").as("qnrm"))
      val dot = dims.join(broadcast(cand), "vec_id")
        .join(broadcast(qdims), col("p") === col("qp"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("x") * col("qx")).cast("double").as("dot"))
      dot.join(norms, "vec_id").crossJoin(broadcast(qnrm))
        .select(col("vec_id"), col("label"),
          (col("dot") / sqrt(col("nrm") * col("qnrm"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
    },
    Some(
      s"""WITH iv AS ($intVecsSql),
         |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
         |dims AS (SELECT vec_id, label, p, iv[p] AS x FROM iv, pos),
         |planes AS (SELECT unnest(generate_series(0, 3)) AS pl),
         |hyper AS (SELECT pl, p,
         |    CAST(('0x' || substr(md5('hp|' || CAST(pl AS VARCHAR) || '|'
         |      || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS w
         |  FROM planes, pos),
         |proj AS (SELECT d.vec_id, h.pl, sum(d.x * h.w) AS s
         |         FROM dims d JOIN hyper h ON d.p = h.p GROUP BY 1, 2),
         |sig AS (SELECT vec_id,
         |    CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, pl) AS BIGINT)
         |             ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY 1),
         |qb AS (SELECT bucket AS qbucket FROM sig WHERE vec_id = $queryVecId),
         |flips AS (SELECT pl FROM (
         |            SELECT pl, row_number() OVER (ORDER BY abs(s), pl) AS rk
         |            FROM proj WHERE vec_id = $queryVecId)
         |          WHERE rk <= 2),
         |probes AS (SELECT qbucket AS pb FROM qb
         |           UNION ALL
         |           SELECT xor(qb.qbucket, CAST(pow(2, f.pl) AS BIGINT))
         |           FROM qb, flips f),
         |cand AS (SELECT DISTINCT s.vec_id FROM sig s JOIN probes pr
         |           ON s.bucket = pr.pb
         |         WHERE s.vec_id <> $queryVecId),
         |norms AS (SELECT vec_id, CAST(sum(x * x) AS DOUBLE) AS nrm
         |          FROM dims GROUP BY 1),
         |qdims AS (SELECT p AS qp, x AS qx FROM dims WHERE vec_id = $queryVecId),
         |qnrm AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = $queryVecId),
         |dot AS (SELECT d.vec_id, d.label, CAST(sum(d.x * q.qx) AS DOUBLE) AS dot
         |        FROM dims d JOIN cand c ON d.vec_id = c.vec_id
         |        JOIN qdims q ON d.p = q.qp GROUP BY 1, 2)
         |SELECT vec_id, label, dot / sqrt(nrm * qnrm) AS cosine
         |FROM dot JOIN norms USING (vec_id), qnrm
         |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))

  /** q58 — L2 normalization: unit vectors from the integer-scaled
    * representation (elementwise divide by one deterministic double), the
    * standard preprocessing before cosine/IP search. The unit vector is
    * built as a real ArrayType transform, then exploded to
    * (vec_id, p, unit_val) rows for the gate — the driver's comparator
    * cannot hash array cells (VERDICT r2), and per-component doubles are
    * IEEE-identical across engines. */
  val q58 = Q("q58_embedding_normalize",
    (s, d) => {
      // staged projections: `iv` then `l2` become bound attributes, so
      // the explode lambda divides by a column value — inlining them
      // would re-evaluate the whole norm aggregate (and the scaling
      // transform under it) once PER ELEMENT in the interpreted
      // higher-order-function path: O(dim²) per row, ~40× slower here
      val staged = Catalog.embeddings(s, d)
        .select(col("vec_id"), Similarity.intVec(col("embedding")).as("iv"))
        .select(col("vec_id"), col("iv"),
          sqrt(Similarity.norm2(col("iv")).cast("double")).as("l2"))
      staged
        .select(col("vec_id"), (col("l2") / 1e6).as("l2_norm"),
          posexplode(transform(col("iv"), x => x.cast("double") / col("l2"))))
        .select(col("vec_id"), (col("pos") + 1).cast("bigint").as("p"),
          col("col").as("unit_val"), col("l2_norm"))
    },
    Some(
      s"""WITH iv AS ($intVecsSql),
         |n AS MATERIALIZED (SELECT vec_id, iv,
         |        sqrt(CAST(list_aggregate(list_transform(iv, x -> x * x),
         |          'sum') AS DOUBLE)) AS l2
         |      FROM iv)
         |SELECT vec_id, p,
         |       CAST(iv[p] AS DOUBLE) / l2 AS unit_val,
         |       l2 / 1000000.0 AS l2_norm
         |FROM n, (SELECT unnest(generate_series(1, 64)) AS p) pos""".stripMargin))

  /** q60 — trainable IVF coarse quantizer: 2 deterministic Lloyd k-means
    * passes (seeds = first k vec_ids, exact integer distances, round-mean
    * centroid update — [[graft.ops.KMeans]]) replacing q24's `label`
    * stand-in cells. Output is the full final assignment (vec_id, cid,
    * d2): hash-green means both passes — distances, argmin tie-breaks and
    * the centroid update — are bit-identical to the oracle running the
    * same iterations. */
  val q60 = {
    val k = 8
    Q("q60_ivf_kmeans",
      (s, d) => {
        // persisted: every Lloyd pass (zero-shuffle assignment + centroid
        // update) re-reads vecs; one materialization serves them all
        val vecs = intVecs(s, d).select(col("vec_id"), col("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.ops.KMeans.assign(vecs, k, iters = 2)
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv, pos),
           |seeds AS (SELECT vec_id AS cid, p, x AS c FROM dims
           |          WHERE vec_id < $k),
           |dist1 AS (SELECT d.vec_id, s.cid,
           |            sum((d.x - s.c) * (d.x - s.c)) AS d2
           |          FROM dims d JOIN seeds s USING (p) GROUP BY 1, 2),
           |a1 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY d2, cid) AS rn
           |         FROM dist1) WHERE rn = 1),
           |c1 AS (SELECT a.cid, d.p,
           |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
           |           AS c
           |       FROM dims d JOIN a1 a USING (vec_id) GROUP BY 1, 2),
           |dist2 AS (SELECT d.vec_id, c.cid,
           |            sum((d.x - c.c) * (d.x - c.c)) AS d2
           |          FROM dims d JOIN c1 c USING (p) GROUP BY 1, 2)
           |SELECT vec_id, cid, CAST(d2 AS BIGINT) AS d2 FROM (
           |  SELECT vec_id, cid, d2,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |  FROM dist2) WHERE rn = 1""".stripMargin))
  }

  /** q68 — IVF search END-TO-END with the TRAINED quantizer: k-means
    * cells from [[graft.ops.KMeans]] (q60's two Lloyd passes) replace
    * q24's `label` stand-in, then the same coarse-probe → exact-rerank
    * search runs over the learned cells. Hash-green means training,
    * cell-centroid derivation, probing and reranking all agree with the
    * oracle end to end. Same scale shape as q24 (probe-bounded exact
    * work) plus the quantizer's two passes. */
  val q68 = {
    val k = 8
    Q("q68_ivf_kmeans_search",
      (s, d) => {
        val vecs = intVecs(s, d).select(col("vec_id"), col("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dims = vecs
          .select(col("vec_id"), posexplode(col("iv")))
          .withColumnRenamed("pos", "p").withColumnRenamed("col", "x")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val asg = graft.ops.KMeans.assign(vecs, k, iters = 2)
          .select(col("vec_id"), col("cid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // celled / norms / qdims / cent are each consumed TWICE below —
        // unpinned, every consumer re-ran the dims⋈asg join or the
        // aggregation over cache and paid its own AQE stage-jobs (the
        // q175 re-expansion shape, r19); pinned, each runs ONCE
        val celled = dims.join(asg, "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        val norms = dims.groupBy(col("vec_id"))
          .agg(sum(col("x") * col("x")).cast("double").as("nrm"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val qdims = dims.filter(col("vec_id") === queryVecId)
          .select(col("p").as("qp"), col("x").as("qx"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val qnrm = norms.filter(col("vec_id") === queryVecId)
          .select(col("nrm").as("qnrm"))

        // coarse: integer centroid per LEARNED cell, cosine to query
        val cent = celled.groupBy(col("cid"), col("p"))
          .agg(round(sum(col("x")).cast("double") / count(lit(1)))
            .cast("bigint").as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cnrm = cent.groupBy(col("cid"))
          .agg(sum(col("c") * col("c")).cast("double").as("cnrm"))
        val cdot = cent.join(broadcast(qdims), col("p") === col("qp"))
          .groupBy(col("cid"))
          .agg(sum(col("c") * col("qx")).cast("double").as("cdot"))
        val cells = cdot.join(cnrm, "cid").crossJoin(broadcast(qnrm))
          .select(col("cid"),
            (col("cdot") / sqrt(col("cnrm") * col("qnrm"))).as("cscore"))
          .orderBy(col("cscore").desc, col("cid")).limit(probes)
          .select(col("cid"))

        // fine: exact cosine inside the probed cells only
        val cand = celled.join(broadcast(cells), "cid")
          .filter(col("vec_id") =!= queryVecId)
        val dot = cand.join(broadcast(qdims), col("p") === col("qp"))
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum(col("x") * col("qx")).cast("double").as("dot"))
        dot.join(norms, "vec_id").crossJoin(broadcast(qnrm))
          .select(col("vec_id"), col("cid"),
            (col("dot") / sqrt(col("nrm") * col("qnrm"))).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv, pos),
           |seeds AS (SELECT vec_id AS cid, p, x AS c FROM dims
           |          WHERE vec_id < $k),
           |dist1 AS (SELECT d.vec_id, s.cid,
           |            sum((d.x - s.c) * (d.x - s.c)) AS d2
           |          FROM dims d JOIN seeds s USING (p) GROUP BY 1, 2),
           |a1 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY d2, cid) AS rn
           |         FROM dist1) WHERE rn = 1),
           |c1 AS (SELECT a.cid, d.p,
           |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
           |           AS c
           |       FROM dims d JOIN a1 a USING (vec_id) GROUP BY 1, 2),
           |dist2 AS (SELECT d.vec_id, c.cid,
           |            sum((d.x - c.c) * (d.x - c.c)) AS d2
           |          FROM dims d JOIN c1 c USING (p) GROUP BY 1, 2),
           |a2 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
           |             AS rn
           |         FROM dist2) WHERE rn = 1),
           |celled AS (SELECT d.vec_id, a.cid, d.p, d.x
           |           FROM dims d JOIN a2 a USING (vec_id)),
           |norms AS (SELECT vec_id, CAST(sum(x * x) AS DOUBLE) AS nrm
           |          FROM dims GROUP BY 1),
           |qdims AS (SELECT p AS qp, x AS qx FROM dims
           |          WHERE vec_id = $queryVecId),
           |qnrm AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = $queryVecId),
           |cent AS (SELECT cid, p,
           |           CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)
           |             AS c
           |         FROM celled GROUP BY 1, 2),
           |cnrm AS (SELECT cid, CAST(sum(c * c) AS DOUBLE) AS cnrm
           |         FROM cent GROUP BY 1),
           |cdot AS (SELECT cid, CAST(sum(c * qx) AS DOUBLE) AS cdot
           |         FROM cent JOIN qdims ON p = qp GROUP BY 1),
           |cells AS (SELECT cid
           |          FROM cdot JOIN cnrm USING (cid), qnrm
           |          ORDER BY cdot / sqrt(cnrm * qnrm) DESC, cid
           |          LIMIT $probes),
           |cand AS (SELECT ce.* FROM celled ce JOIN cells USING (cid)
           |         WHERE vec_id <> $queryVecId),
           |dot AS (SELECT vec_id, cid, CAST(sum(x * qx) AS DOUBLE) AS dot
           |        FROM cand JOIN qdims ON p = qp GROUP BY 1, 2)
           |SELECT vec_id, cid, dot / sqrt(nrm * qnrm) AS cosine
           |FROM dot JOIN norms USING (vec_id), qnrm
           |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))
  }

  /** q84 — SEMANTIC DEDUP (the SemDeDup shape): embedding near-dup pairs
    * found inside LEARNED k-means cells (the same two Lloyd passes as
    * q60) refined by an 8-bit sign sub-bucket — pairwise exact cosine
    * runs only within (cell, sign-bucket) blocks, never corpus². The
    * corpus is the q22 dup-injection (every 5th vector re-appears under
    * vec_id+100000), so exact duplicates — identical embeddings, hence
    * identical cell AND identical sign bits — are guaranteed findable;
    * borderline cross-block pairs are the documented recall tradeoff of
    * any blocked semantic dedup, and the oracle computes the identical
    * blocking, so hash-green proves training + blocking + scoring end to
    * end.
    *
    * Scale shape (100 TB): k-means is q60's (aggregates over exploded
    * dims, centroids broadcastable); blocking bounds pair fan-out to
    * Σ_blocks n_b² with ~corpus/(k·256) expected block size; the
    * pairwise stage is a bucket equi-join scoring with the fused native
    * [[graft.functions.CosineScaled]] expression. */
  val q84 = {
    val k = 8
    val thr = 0.99
    def signBits(iv: Column): Column =
      (0 until 8).map(i =>
        when(element_at(iv, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
    Q("q84_semantic_dedup",
      (s, d) => {
        val e = Catalog.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val corpus = e.unionAll(e.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val vecs = corpus
          .select(col("vec_id"), Similarity.intVec(col("embedding")).as("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cells = graft.ops.KMeans.assign(vecs, k, iters = 2)
          .select(col("vec_id"), col("cid"))
        // persisted: vec feeds BOTH self-join sides — without it the
        // corpus union, the cell join and the sign-bit scaling all run
        // twice (the k-means assignment projection is the dominant
        // per-row arithmetic here)
        val vec = corpus.join(cells, "vec_id")
          .select(col("vec_id"), col("cid"), col("embedding"),
            signBits(Similarity.intVec(col("embedding"))).as("sb"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        vec.as("a").join(vec.as("b"),
            col("a.cid") === col("b.cid") && col("a.sb") === col("b.sb") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            col("a.cid").as("cid"),
            graft.functions.CosineScaled(col("a.embedding"), col("b.embedding"))
              .as("cosine"))
          .filter(col("cosine") >= thr)
      },
      Some(
        s"""WITH e AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 100000, embedding FROM embeddings
           |  WHERE vec_id % 5 = 0),
           |iv0 AS (SELECT vec_id,
           |          list_transform(embedding,
           |            x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
           |            AS iv
           |        FROM e),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv0, pos),
           |seeds AS (SELECT vec_id AS cid, p, x AS c FROM dims
           |          WHERE vec_id < $k),
           |dist1 AS (SELECT d.vec_id, s.cid,
           |            sum((d.x - s.c) * (d.x - s.c)) AS d2
           |          FROM dims d JOIN seeds s USING (p) GROUP BY 1, 2),
           |a1 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY d2, cid) AS rn
           |         FROM dist1) WHERE rn = 1),
           |c1 AS (SELECT a.cid, d.p,
           |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
           |           AS c
           |       FROM dims d JOIN a1 a USING (vec_id) GROUP BY 1, 2),
           |dist2 AS (SELECT d.vec_id, c.cid,
           |            sum((d.x - c.c) * (d.x - c.c)) AS d2
           |          FROM dims d JOIN c1 c USING (p) GROUP BY 1, 2),
           |a2 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
           |             AS rn
           |         FROM dist2) WHERE rn = 1),
           |n AS MATERIALIZED (SELECT vec_id, iv,
           |        CAST(list_aggregate(list_transform(iv, x -> x * x), 'sum')
           |          AS DOUBLE) AS nrm,
           |        list_aggregate(list_transform(generate_series(1, 8),
           |          i -> CASE WHEN iv[i] > 0
           |               THEN CAST(1 AS BIGINT) << (i - 1)
           |               ELSE CAST(0 AS BIGINT) END), 'sum') AS sb
           |      FROM iv0),
           |v AS (SELECT n.*, a2.cid FROM n JOIN a2 USING (vec_id))
           |SELECT vec_a, vec_b, cid, cosine FROM (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cid,
           |    CAST(list_aggregate(list_transform(generate_series(1, 64),
           |      i -> a.iv[i] * b.iv[i]), 'sum') AS DOUBLE)
           |      / sqrt(a.nrm * b.nrm) AS cosine
           |  FROM v a JOIN v b ON a.cid = b.cid AND a.sb = b.sb
           |    AND a.vec_id < b.vec_id)
           |WHERE cosine >= $thr""".stripMargin))
  }

  /** q102 — PRODUCT QUANTIZATION (the PQ/ADC member of the ANN family,
    * completing brute → LSH → IVF → trained-IVF → PQ): the 64-dim
    * integer vectors split into 8 subspaces of 8 dims; each subspace
    * has a 4-cell codebook (subvectors of the first 4 vectors — the
    * deterministic seeds-as-codebook choice, same convention as q60's
    * seeding); every vector encodes to 8 small codes, and the
    * asymmetric distance to the query is the sum of 8 PRECOMPUTED
    * query-to-centroid subdistances looked up by code. Codebooks and
    * the query's distance table are driver-collected literals (5 rows +
    * a 8×4 long table), so encode+ADC is a ZERO-shuffle projection per
    * row and the only ordering work is the bounded top-k
    * (TakeOrdered). All arithmetic is exact int64; ties break
    * (distance, cell) / (adc, vec_id) — total orders both engines
    * share. */
  val q102 = {
    val numSub = 8
    val subDim = 8
    val cells = 4
    Q("q102_pq_ann",
      (s, d) => {
        val vecs = intVecs(s, d).select(col("vec_id"), col("iv"))
        val small = vecs
          .filter(col("vec_id") < cells || col("vec_id") === queryVecId)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val seeds = (0 until cells).map(c => small(c.toLong))
        val qv = small(queryVecId)
        def sub(v: Seq[Long], si: Int): Seq[Long] =
          v.slice(si * subDim, (si + 1) * subDim)
        def d2(a: Seq[Long], b: Seq[Long]): Long =
          a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        // qdTable(si)(c): exact ||q_si - seed_c,si||², the ADC lookup
        val qdTable = (0 until numSub).map(si =>
          (0 until cells).map(c => d2(sub(qv, si), sub(seeds(c), si))))
        val adc = (0 until numSub).map { si =>
          val sv = slice(col("iv"), si * subDim + 1, subDim)
          val code = array_min(array((0 until cells).map { c =>
            struct(
              aggregate(zip_with(sv, typedlit(sub(seeds(c), si)),
                (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
                .as("d2"),
              lit(c).as("cid"))
          }: _*)).getField("cid")
          element_at(typedlit(qdTable(si)), code + 1)
        }.reduce(_ + _)
        vecs.filter(col("vec_id") =!= queryVecId)
          .select(col("vec_id"), adc.as("adc"))
          .orderBy(col("adc").asc, col("vec_id").asc).limit(topK)
      },
      Some {
        def dist(tbl: String, si: Int, c: Int): String = {
          val off = si * subDim
          s"list_aggregate(list_transform(generate_series(1, $subDim), " +
            s"j -> ($tbl.iv[$off + j] - s$c.iv[$off + j]) * " +
            s"($tbl.iv[$off + j] - s$c.iv[$off + j])), 'sum')"
        }
        val distCols = (for (si <- 0 until numSub; c <- 0 until cells)
          yield s"${dist("v", si, c)} AS d${si}_$c").mkString(",\n    ")
        val qdCols = (for (si <- 0 until numSub; c <- 0 until cells)
          yield s"${dist("q", si, c)} AS qd${si}_$c").mkString(",\n    ")
        def codeCase(si: Int): String =
          s"CASE WHEN d${si}_0 <= d${si}_1 AND d${si}_0 <= d${si}_2 " +
            s"AND d${si}_0 <= d${si}_3 THEN 0 " +
            s"WHEN d${si}_1 <= d${si}_2 AND d${si}_1 <= d${si}_3 THEN 1 " +
            s"WHEN d${si}_2 <= d${si}_3 THEN 2 ELSE 3 END"
        val termCols = (0 until numSub).map(si =>
          s"CASE ${codeCase(si)} " +
            (0 until cells).map(c => s"WHEN $c THEN qd.qd${si}_$c").mkString(" ") +
            s" END AS t$si").mkString(",\n    ")
        val seedsCtes = (0 until cells).map(c =>
          s"s$c AS (SELECT iv FROM iv WHERE vec_id = $c)").mkString(",\n")
        s"""WITH iv AS ($intVecsSql),
           |$seedsCtes,
           |qv AS (SELECT iv FROM iv WHERE vec_id = $queryVecId),
           |qd AS (SELECT
           |    $qdCols
           |  FROM qv q, ${(0 until cells).map(c => s"s$c").mkString(", ")}),
           |dists AS (SELECT v.vec_id,
           |    $distCols
           |  FROM iv v, ${(0 until cells).map(c => s"s$c").mkString(", ")}
           |  WHERE v.vec_id <> $queryVecId)
           |SELECT vec_id,
           |  CAST(${(0 until numSub).map(si => s"t$si").mkString(" + ")}
           |    AS BIGINT) AS adc
           |FROM (SELECT vec_id,
           |    $termCols
           |  FROM dists, qd)
           |ORDER BY adc, vec_id LIMIT $topK""".stripMargin
      })
  }

  /** q138 — PERSISTENT ANN INDEX with delta maintenance
    * ([[graft.ops.AnnIndex]]): similarity search's analog of q96's
    * stored dedup index. The quantizer trains ONCE on the history
    * corpus and is materialized (centroids + cell assignments); the
    * delta batch is assigned to the STORED centroids with one
    * zero-shuffle literal projection and appended; the probe query
    * reads the stored index — it provably retrains nothing
    * (ScaleSpec pins the plan shape). The oracle replays the same
    * pipeline declaratively: train on history, assign all against the
    * trained centroids, probe + exact rerank — hash-green proves the
    * store/append/probe decomposition loses nothing vs the monolithic
    * computation. */
  val q138 = {
    val k = 8
    val deltaMod = 500L
    val deltaFrom = 400L
    Q("q138_persistent_ann_index",
      (s, d) => {
        val tag = java.nio.file.Paths.get(d).getFileName.toString
          .replaceAll("[^A-Za-z0-9]", "_")
        val idx = s"${graft.ops.Fixtures.root(s)}/ann_index/$tag"
        val vecs = intVecs(s, d).select(col("vec_id"), col("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val isDelta = (col("vec_id") % deltaMod) >= deltaFrom
        // 1. history: the stored index previous runs left behind
        graft.ops.AnnIndex.build(s, vecs.filter(!isDelta), k, iters = 2, idx)
        // 2. the append batch: assigned to stored centroids, no retrain
        graft.ops.AnnIndex.appendDelta(s, idx, vecs.filter(isDelta))
        // 3. the probe: stored centroids + stored assignments only
        graft.ops.AnnIndex.search(s, idx, vecs, queryVecId, probes, topK)
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv, pos),
           |hist AS (SELECT * FROM dims WHERE vec_id % $deltaMod < $deltaFrom),
           |seeds AS (SELECT vec_id AS cid, p, x AS c FROM hist
           |          WHERE vec_id < $k),
           |dist1 AS (SELECT d.vec_id, s.cid,
           |            sum((d.x - s.c) * (d.x - s.c)) AS d2
           |          FROM hist d JOIN seeds s USING (p) GROUP BY 1, 2),
           |a1 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY d2, cid) AS rn
           |         FROM dist1) WHERE rn = 1),
           |c1 AS (SELECT a.cid, d.p,
           |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
           |           AS c
           |       FROM hist d JOIN a1 a USING (vec_id) GROUP BY 1, 2),
           |distAll AS (SELECT d.vec_id, c.cid,
           |              sum((d.x - c.c) * (d.x - c.c)) AS d2
           |            FROM dims d JOIN c1 c USING (p) GROUP BY 1, 2),
           |asg AS (SELECT vec_id, cid FROM (
           |          SELECT vec_id, cid,
           |            row_number() OVER (PARTITION BY vec_id
           |                               ORDER BY d2, cid) AS rn
           |          FROM distAll) WHERE rn = 1),
           |qd AS (SELECT p, x AS qx FROM dims WHERE vec_id = $queryVecId),
           |qn AS (SELECT sum(qx * qx) AS qnrm FROM qd),
           |cnrm AS (SELECT cid, sum(c * c) AS cnrm FROM c1 GROUP BY 1),
           |cdot AS (SELECT c.cid, sum(c.c * qd.qx) AS cdot
           |         FROM c1 c JOIN qd ON c.p = qd.p GROUP BY 1),
           |cells AS (SELECT cid FROM (
           |            SELECT d.cid,
           |              CAST(d.cdot AS DOUBLE) /
           |                sqrt(CAST(n.cnrm AS DOUBLE) * CAST(q.qnrm AS DOUBLE))
           |                AS cscore
           |            FROM cdot d JOIN cnrm n USING (cid), qn q
           |            ORDER BY cscore DESC, cid LIMIT $probes)),
           |norms AS (SELECT vec_id, sum(x * x) AS nrm FROM dims GROUP BY 1),
           |dt AS (SELECT d.vec_id, sum(d.x * qd.qx) AS dot
           |       FROM dims d JOIN qd ON d.p = qd.p
           |       WHERE d.vec_id <> $queryVecId GROUP BY 1)
           |SELECT a.vec_id, a.cid,
           |  CAST(t.dot AS DOUBLE) /
           |    sqrt(CAST(n.nrm AS DOUBLE) * CAST(q.qnrm AS DOUBLE)) AS cosine
           |FROM asg a JOIN cells USING (cid)
           |  JOIN dt t ON t.vec_id = a.vec_id
           |  JOIN norms n ON n.vec_id = a.vec_id, qn q
           |ORDER BY cosine DESC, a.vec_id LIMIT $topK""".stripMargin))
  }

  /** q150 — ANN RECALL@K: the measured accuracy dial for the stored
    * IVF index — exact integer overlap between q138's stored-index
    * probe and the brute-force top-k, per query vector and per
    * k ∈ {1, 10}. A 100 TB approximate operator you can't measure the
    * accuracy of is a dial nobody can safely turn: this query IS the
    * measurement, and because overlap counts are exact integers the
    * DuckDB oracle replays it bit-for-bit (train → assign → probe →
    * rerank → rank-join → count), hash-green. Scale shape: the brute
    * pass is the q23 broadcast scan, the probe pass is the q138
    * bounded-cell rerank, and the overlap join touches ≤ topK rows per
    * query — recall evaluation costs one brute query per SAMPLED query
    * vector, the standard recall-audit protocol. */
  val q150 = {
    val k = 8
    val deltaMod = 500L
    val deltaFrom = 400L
    val qids = Seq(0L, 7L, 42L)
    val ks = Seq(1, 10)
    Q("q150_ann_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tag = java.nio.file.Paths.get(d).getFileName.toString
          .replaceAll("[^A-Za-z0-9]", "_")
        val idx = s"${graft.ops.Fixtures.root(s)}/ann_recall/$tag"
        val vecs = intVecs(s, d).select(col("vec_id"), col("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val isDelta = (col("vec_id") % deltaMod) >= deltaFrom
        graft.ops.AnnIndex.build(s, vecs.filter(!isDelta), k, iters = 2, idx)
        graft.ops.AnnIndex.appendDelta(s, idx, vecs.filter(isDelta))
        val e = vecs.withColumn("nrm",
          Similarity.norm2(col("iv")).cast("double"))
        val rankW = Window.orderBy(col("cosine").desc, col("vec_id"))
        val matched = qids.map { qid =>
          val approx = graft.ops.AnnIndex
            .search(s, idx, vecs, qid, probes, topK)
            .withColumn("arn", row_number().over(rankW))
            .select(col("vec_id"), col("arn"))
          val q = e.filter(col("vec_id") === qid)
            .select(col("iv").as("qiv"), col("nrm").as("qnrm"))
          val brute = e.filter(col("vec_id") =!= qid)
            .crossJoin(broadcast(q))
            .select(col("vec_id"),
              Similarity.cosineFrom(col("iv"), col("qiv"),
                col("nrm"), col("qnrm")).as("cosine"))
            .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
            .withColumn("brn", row_number().over(rankW))
            .select(col("vec_id"), col("brn"))
          approx.join(brute, "vec_id")
            .select(lit(qid).as("query_id"), col("arn"), col("brn"))
        }.reduce(_ unionByName _)
        import s.implicits._
        val grid = qids.toDF("query_id")
          .crossJoin(ks.toDF("k"))
        val counts = matched.crossJoin(ks.toDF("k"))
          .filter(col("arn") <= col("k") && col("brn") <= col("k"))
          .groupBy(col("query_id"), col("k"))
          .agg(count(lit(1)).as("n_overlap"))
        grid.join(counts, Seq("query_id", "k"), "left")
          .select(col("query_id"), col("k").cast("bigint").as("k"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      Some {
        val perQid = qids.map { qid =>
          s"""qd_$qid AS (SELECT p, x AS qx FROM dims WHERE vec_id = $qid),
             |qn_$qid AS (SELECT sum(qx * qx) AS qnrm FROM qd_$qid),
             |cdot_$qid AS (SELECT c.cid, sum(c.c * q.qx) AS cdot
             |              FROM c1 c JOIN qd_$qid q ON c.p = q.p GROUP BY 1),
             |cells_$qid AS (SELECT cid FROM (
             |    SELECT d.cid, CAST(d.cdot AS DOUBLE) /
             |        sqrt(CAST(n.cnrm AS DOUBLE) * CAST(q.qnrm AS DOUBLE))
             |        AS cscore
             |    FROM cdot_$qid d JOIN cnrm n USING (cid), qn_$qid q
             |    ORDER BY cscore DESC, cid LIMIT $probes)),
             |dt_$qid AS (SELECT d.vec_id, sum(d.x * q.qx) AS dot
             |            FROM dims d JOIN qd_$qid q ON d.p = q.p
             |            WHERE d.vec_id <> $qid GROUP BY 1),
             |ax_$qid AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS arn
             |  FROM (
             |    SELECT a.vec_id, CAST(t.dot AS DOUBLE) /
             |        sqrt(CAST(n.nrm AS DOUBLE) * CAST(q.qnrm AS DOUBLE))
             |        AS cosine
             |    FROM asg a JOIN cells_$qid USING (cid)
             |      JOIN dt_$qid t ON t.vec_id = a.vec_id
             |      JOIN norms n ON n.vec_id = a.vec_id, qn_$qid q
             |    ORDER BY cosine DESC, a.vec_id LIMIT $topK)),
             |bx_$qid AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS brn
             |  FROM (
             |    SELECT t.vec_id, CAST(t.dot AS DOUBLE) /
             |        sqrt(CAST(n.nrm AS DOUBLE) * CAST(q.qnrm AS DOUBLE))
             |        AS cosine
             |    FROM dt_$qid t JOIN norms n USING (vec_id), qn_$qid q
             |    ORDER BY cosine DESC, t.vec_id LIMIT $topK)),
             |m_$qid AS (SELECT $qid AS query_id, a.vec_id, a.arn, b.brn
             |           FROM ax_$qid a JOIN bx_$qid b USING (vec_id))"""
            .stripMargin
        }.mkString(",\n")
        val unions = qids.map(q => s"SELECT * FROM m_$q")
          .mkString(" UNION ALL ")
        val gridQ = qids.map(q => s"($q)").mkString(", ")
        val gridK = ks.map(kk => s"($kk)").mkString(", ")
        s"""WITH iv AS ($intVecsSql),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv, pos),
           |hist AS (SELECT * FROM dims WHERE vec_id % $deltaMod < $deltaFrom),
           |seeds AS (SELECT vec_id AS cid, p, x AS c FROM hist
           |          WHERE vec_id < $k),
           |dist1 AS (SELECT d.vec_id, s.cid,
           |            sum((d.x - s.c) * (d.x - s.c)) AS d2
           |          FROM hist d JOIN seeds s USING (p) GROUP BY 1, 2),
           |a1 AS (SELECT vec_id, cid FROM (
           |         SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY d2, cid) AS rn
           |         FROM dist1) WHERE rn = 1),
           |c1 AS (SELECT a.cid, d.p,
           |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
           |           AS c
           |       FROM hist d JOIN a1 a USING (vec_id) GROUP BY 1, 2),
           |distAll AS (SELECT d.vec_id, c.cid,
           |              sum((d.x - c.c) * (d.x - c.c)) AS d2
           |            FROM dims d JOIN c1 c USING (p) GROUP BY 1, 2),
           |asg AS (SELECT vec_id, cid FROM (
           |          SELECT vec_id, cid,
           |            row_number() OVER (PARTITION BY vec_id
           |                               ORDER BY d2, cid) AS rn
           |          FROM distAll) WHERE rn = 1),
           |cnrm AS (SELECT cid, sum(c * c) AS cnrm FROM c1 GROUP BY 1),
           |norms AS (SELECT vec_id, sum(x * x) AS nrm FROM dims GROUP BY 1),
           |$perQid,
           |matched AS ($unions),
           |grid AS (SELECT q.query_id, kk.k
           |         FROM (VALUES $gridQ) q(query_id), (VALUES $gridK) kk(k))
           |SELECT CAST(g.query_id AS BIGINT) AS query_id,
           |  CAST(g.k AS BIGINT) AS k,
           |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_overlap
           |FROM grid g LEFT JOIN (
           |  SELECT query_id, kk.k, count(*) AS n
           |  FROM matched, (VALUES $gridK) kk(k)
           |  WHERE arn <= kk.k AND brn <= kk.k GROUP BY 1, 2) c
           |  ON g.query_id = c.query_id AND g.k = c.k""".stripMargin
      })
  }

  /** q153 — RECALL@K FOR THE OTHER APPROXIMATE PATHS: q150 audits the
    * stored IVF index; this closes the loop for LSH bucketing (q56),
    * the trained-quantizer IVF search (q68) and the graph-traversal
    * search (q165) — every approximate similarity path now has a
    * measured accuracy dial against the same
    * brute-force top-k (q23), as exact integer overlaps per
    * k ∈ {1, 10}. Composes the EXISTING oracles as CTEs (the q143
    * pattern), so the audit can never drift from the audited queries.
    * Pure dataflow — the approximate and brute pipelines run side by
    * side and meet in a ≤ topK-row rank join. */
  // lazy: references q165, declared below (graph-ANN family) — forcing
  // happens at `all`, by which point every member is initialized
  lazy val q153 = {
    val ks = Seq(1, 10)
    Q("q153_ann_recall_paths",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val rankW = Window.orderBy(col("cosine").desc, col("vec_id"))
        def ranked(df: DataFrame, rn: String): DataFrame =
          df.select(col("vec_id"), col("cosine"))
            .withColumn(rn, row_number().over(rankW))
            .select(col("vec_id"), col(rn))
        val brute = ranked(q23.run(s, d), "brn")
        val paths = Seq("lsh" -> q56, "ivf_trained" -> q68, "graph" -> q165)
        import s.implicits._
        val matched = paths.map { case (p, q) =>
          ranked(q.run(s, d), "arn").join(brute, "vec_id")
            .select(lit(p).as("path"), col("arn"), col("brn"))
        }.reduce(_ unionByName _)
        val grid = paths.map(_._1).toDF("path").crossJoin(ks.toDF("k"))
        val counts = matched.crossJoin(ks.toDF("k"))
          .filter(col("arn") <= col("k") && col("brn") <= col("k"))
          .groupBy(col("path"), col("k"))
          .agg(count(lit(1)).as("n_overlap"))
        grid.join(counts, Seq("path", "k"), "left")
          .select(col("path"), col("k").cast("bigint").as("k"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      for {
        lshSql <- q56.oracle
        ivfSql <- q68.oracle
        graphSql <- q165.oracle
        bruteSql <- q23.oracle
      } yield {
        val gridK = ks.map(kk => s"($kk)").mkString(", ")
        // splice AFTER stripMargin: the embedded oracles contain `||`
        // at line starts, which a second stripMargin would mutilate
        s"""WITH approx_lsh AS (__LSH__),
           |approx_ivf AS (__IVF__),
           |approx_graph AS (__GRAPH__),
           |brute AS (__BRUTE__),
           |br AS (SELECT vec_id,
           |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS brn
           |       FROM brute),
           |al AS (SELECT vec_id,
           |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS arn
           |       FROM approx_lsh),
           |ai AS (SELECT vec_id,
           |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS arn
           |       FROM approx_ivf),
           |ag AS (SELECT vec_id,
           |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS arn
           |       FROM approx_graph),
           |matched AS (
           |  SELECT 'lsh' AS path, a.arn, b.brn
           |  FROM al a JOIN br b USING (vec_id)
           |  UNION ALL
           |  SELECT 'ivf_trained', a.arn, b.brn
           |  FROM ai a JOIN br b USING (vec_id)
           |  UNION ALL
           |  SELECT 'graph', a.arn, b.brn
           |  FROM ag a JOIN br b USING (vec_id)),
           |grid AS (SELECT p.path, kk.k
           |         FROM (VALUES ('lsh'), ('ivf_trained'), ('graph')) p(path),
           |              (VALUES $gridK) kk(k))
           |SELECT g.path, CAST(g.k AS BIGINT) AS k,
           |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_overlap
           |FROM grid g LEFT JOIN (
           |  SELECT path, kk.k, count(*) AS n
           |  FROM matched, (VALUES $gridK) kk(k)
           |  WHERE arn <= kk.k AND brn <= kk.k GROUP BY 1, 2) c
           |  ON g.path = c.path AND g.k = c.k""".stripMargin
          .replace("__LSH__", lshSql)
          .replace("__IVF__", ivfSql)
          .replace("__GRAPH__", graphSql)
          .replace("__BRUTE__", bruteSql)
      })
  }

  // ---- the graph-ANN family (q164/q165): NN-Descent kNN graph +
  // graph-traversal search, the last member of the approximate-search
  // family (brute/LSH/IVF/trained-IVF/PQ/graph) ----

  private val graphK = 6
  private val graphBits = 4
  private val graphRounds = 2
  private val graphAuditMod = 50L
  private val graphBeam = 4
  private val graphDeltaMod = 500L
  private val graphDeltaFrom = 400L

  /** Oracle side of [[bruteEdges]]: true top-$graphK per audited node. */
  private lazy val bruteSqlCte: String =
    s"""brute AS (SELECT u, v FROM (
       |    SELECT a.vec_id AS u, b.vec_id AS v,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cosSql("a", "b")} DESC, b.vec_id) AS rn
       |    FROM n a JOIN n b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id % $graphAuditMod = 0) WHERE rn <= $graphK)"""
      .stripMargin

  /** (vec_id, embedding, sb1, sb2): the corpus with TWO independent
    * sign-bucket blocking keys (dims 1-4 and 5-8) — the multi-table
    * LSH init. Persisted — feeds init pairing, candidate scoring
    * (twice per round) and the exact rerank; without it every leaf
    * re-scans the parquet and re-derives the integer scaling.
    * Memoized per (session, dataset): seven graph queries share this
    * relation, and a fresh persist() per call would leak one
    * corpus-sized MEMORY_AND_DISK block per invocation for the life
    * of the session. re-persist() on the memoized plan is a no-op
    * when cached and re-registers after a clearCache (the bench
    * clears between timed runs — each run still pays its own
    * materialization). */
  /** Data-generation + code-generation stamp for the stored graph
    * indexes (q170/q175): source path, content length and max mtime
    * via Hadoop FileSystem (works for any FS and for directory-shaped
    * parquet, where java.io.File length/mtime silently read 0), plus
    * the graph parameters the index meta's own fields don't capture
    * (graphBits shapes the bucket VALUES, not the bucket column
    * names) and a format-version constant. A testdata refresh or a
    * constant change forces the rebuild; anything else reuses the
    * stored index — the amortization a persistent index exists for. */
  private def dataStamp(s: SparkSession, d: String): String = {
    val srcP = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = srcP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(srcP)
    val (len, mtime) =
      if (st.isDirectory) {
        val kids = fs.listStatus(srcP).filter(_.isFile)
        (kids.map(_.getLen).sum,
          if (kids.isEmpty) st.getModificationTime
          else kids.map(_.getModificationTime).max)
      } else (st.getLen, st.getModificationTime)
    s"$d:$len:$mtime:${initToken(s, d)}:fmt=2"
  }

  /** STORED refined k-NN graph over `d`'s embeddings — the
    * pre-existing state q165 (search) and q166 (maintain) operate ON:
    * a deployment builds the graph once per corpus generation (q164 is
    * the build operator's own bench; q170 the durable-publish
    * lifecycle), then serves searches and absorbs deltas from the
    * stored edge relation. Built behind [[graft.ops.Fixtures.ensure]]
    * (stamped by embeddings generation + every graph parameter), so
    * the timed queries run exactly the traversal / delta-maintenance
    * dataflow. `tag`/`filter` select the corpus slice ("full" for
    * q165, the non-delta "base" for q166). */
  private def storedBuiltGraph(s: SparkSession, d: String, tag: String,
      filter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val store = s"${graft.ops.Fixtures.root(s)}/knn_graph_${tag}_" +
      graft.ops.Fixtures.pathKey(d)
    val stamp = graft.ops.Fixtures.datasetStamp(s, s"$d/embeddings.parquet") +
      s"|k=$graphK|rounds=$graphRounds|${initToken(s, d)}|tag=$tag" +
      s"|algo=${graft.ops.KnnGraph.algoVersion}|fmt=1"
    graft.ops.Fixtures.ensure(s, store, stamp) { stg =>
      val vecs = graphVecs(s, d)
      val src = filter.map(vecs.filter).getOrElse(vecs)
      graft.ops.KnnGraph.build(src, graphK, rounds = graphRounds,
          bucketCols = Seq("sb1", "sb2"), nHint = Some(corpusN(s, d)))
        .write.mode("overwrite").parquet(stg)
    }
    s.read.parquet(store)
  }

  /** EFFECTIVE init-key kind for dataset `d` — the
    * [[graft.ops.KnnGraph.initKind]] policy applied to the corpus's
    * exact row count read from parquet FOOTERS (driver-side metadata,
    * zero jobs; one `count()` job as the refusal fallback). At the
    * registered test scales (≤2k vectors) this resolves to sign
    * buckets at the `graphBits` floor, so bucket values — and
    * therefore every stored graph fixture and oracle replay — are
    * unchanged; on a 100×+ corpus the width grows with log(N), and
    * past the 16-bit clamp (~17M vectors at targetBlock 256) the key
    * becomes the q60 trained-quantizer cell id — the init term stays
    * linear at ANY N instead of inheriting N²/2^bits silently.
    * Memoized per dataset CONTENT STAMP, not per path (r15 VERDICT
    * #6): an in-place dataset regeneration changes the stamp, so the
    * kind is re-derived from the NEW row count in the same process —
    * a path-keyed memo would keep serving the old kind for the
    * process lifetime even after the corpus crossed the clamp. */
  private val graphInitMemo = scala.collection.concurrent
    .TrieMap.empty[(String, String), graft.ops.KnnGraph.InitKind]
  private def embStamp(s: SparkSession, d: String): String =
    try graft.ops.Fixtures.datasetStamp(s, s"$d/embeddings.parquet")
    catch { case _: Exception => "nostamp" }
  /** Embedding-corpus row count from parquet FOOTERS (zero jobs; one
    * count() as the refusal fallback), memoized per content stamp —
    * feeds [[effectiveInitKind]], the [[graft.ops.KnnGraph.build]]
    * refinement-form hint, and [[graft.ops.KnnGraph.withInitBuckets]]'s
    * seed-slice clamp (which would otherwise pay a full count pass). */
  private val corpusNMemo = scala.collection.concurrent
    .TrieMap.empty[(String, String), Long]
  private def corpusN(s: SparkSession, d: String): Long =
    corpusNMemo.getOrElseUpdate((d, embStamp(s, d)),
      graft.ops.MetadataMax.parquetRowCount(s, s"$d/embeddings.parquet")
        .getOrElse(Catalog.embeddings(s, d).count()))
  private[graft] def effectiveInitKind(s: SparkSession,
      d: String): graft.ops.KnnGraph.InitKind =
    graphInitMemo.getOrElseUpdate((d, embStamp(s, d)),
      graft.ops.KnnGraph.initKind(corpusN(s, d), graphBits))

  /** The init kind as a stamp token for the stored-graph fixtures.
    * The sign path keeps the legacy `bits=N` spelling so every
    * existing stored fixture stays valid (no rebuild churn — the q170
    * r14 lesson); a quantizer corpus stamps `qcells=N`, forcing a
    * rebuild if a corpus ever crosses the clamp in place. */
  private def initToken(s: SparkSession, d: String): String =
    effectiveInitKind(s, d) match {
      case graft.ops.KnnGraph.InitKind.SignBuckets(b) => s"bits=$b"
      case graft.ops.KnnGraph.InitKind.QuantizerCells(c, sb) =>
        s"qcells=${c}x$sb"
    }

  // cached AND persisted, so staleness would serve old DATA, not just
  // an old plan: the memo value carries the content stamp it was built
  // under, and a stamp mismatch (in-place regeneration) unpersists the
  // stale cache and derives fresh — under the then-current init kind.
  // The check-then-rebuild section is synchronized (r16 ADVICE): the
  // memo is mutation-bearing (unpersist of the displaced entry), and
  // two concurrent first-callers would otherwise both build, the
  // loser's persisted corpus copy leaking for the session lifetime.
  private val graphVecsMemo = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String), (String, DataFrame)]
  private def graphVecs(s: SparkSession, d: String): DataFrame = {
    val stamp = embStamp(s, d)
    val df = graphVecsMemo.synchronized {
      graphVecsMemo.get((s, d)) match {
        case Some((st, cached)) if st == stamp => cached
        case prev =>
          prev.foreach(_._2.unpersist())
          val base = Catalog.embeddings(s, d)
            .select(col("vec_id"), col("embedding"), col("label"),
              Similarity.intVec(col("embedding")).as("iv"))
          val fresh = graft.ops.KnnGraph
            .withInitBuckets(base, effectiveInitKind(s, d),
              nTrainHint = Some(corpusN(s, d)))
            .drop("iv")
          graphVecsMemo((s, d)) = (stamp, fresh)
          fresh
      }
    }
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact cosine between CTE aliases `$a.iv` and `$b.iv` (oracle side
    * of [[graft.functions.CosineScaled]]). */
  private def cosSql(a: String, b: String): String =
    s"CAST(list_aggregate(list_transform(generate_series(1, 64), " +
      s"i -> $a.iv[i] * $b.iv[i]), 'sum') AS DOUBLE) / sqrt($a.nrm * $b.nrm)"

  /** Cosine of `$a.iv` against the 1-row query CTE `q(qiv, qnrm, ...)`. */
  private def cosQSql(a: String): String =
    s"CAST(list_aggregate(list_transform(generate_series(1, 64), " +
      s"i -> $a.iv[i] * q.qiv[i]), 'sum') AS DOUBLE) / sqrt($a.nrm * q.qnrm)"

  /** Oracle replay of one [[graft.ops.KnnGraph.build]] chain
    * ($graphRounds refinement rounds, one generated CTE triple per
    * round) over source CTE `$src` (which must expose vec_id, iv,
    * nrm, sb1, sb2), every CTE name suffixed `$sfx`, ending at
    * `ref$sfx(u, v)` — the refined directed graph. */
  private def graphChainSql(src: String, sfx: String): String = {
    // AS MATERIALIZED on every multiply-referenced CTE: DuckDB
    // otherwise re-inlines the whole construction chain at each
    // reference (symmetrize reads its input twice, the audit reads
    // `ref` twice, q165 walks it three times) — the q61 lesson
    val rounds = (1 to graphRounds).map { r =>
      val prev = if (r == 1) s"g0$sfx" else s"ref${r - 1}$sfx"
      s"""sym$r$sfx AS MATERIALIZED (SELECT u, v FROM $prev
         |          UNION SELECT v AS u, u AS v FROM $prev),
         |cand$r$sfx AS (SELECT DISTINCT u, v FROM (
         |           SELECT e1.u AS u, e2.v AS v
         |           FROM sym$r$sfx e1 JOIN sym$r$sfx e2 ON e1.v = e2.u
         |           WHERE e1.u <> e2.v
         |           UNION ALL SELECT u, v FROM $prev)),
         |ref$r$sfx AS MATERIALIZED (SELECT u, v FROM (SELECT c.u, c.v,
         |          row_number() OVER (PARTITION BY c.u
         |            ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rn
         |        FROM cand$r$sfx c JOIN $src a ON c.u = a.vec_id
         |          JOIN $src b ON c.v = b.vec_id) WHERE rn <= $graphK)"""
        .stripMargin
    }.mkString(",\n")
    s"""initc$sfx AS (SELECT a.vec_id AS u, b.vec_id AS v
       |          FROM $src a JOIN $src b
       |            ON a.sb1 = b.sb1 AND a.vec_id <> b.vec_id
       |          UNION
       |          SELECT a.vec_id, b.vec_id
       |          FROM $src a JOIN $src b
       |            ON a.sb2 = b.sb2 AND a.vec_id <> b.vec_id),
       |g0$sfx AS (SELECT u, v FROM (SELECT c.u, c.v,
       |         row_number() OVER (PARTITION BY c.u
       |           ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rn
       |         FROM initc$sfx c JOIN $src a ON c.u = a.vec_id
       |           JOIN $src b ON c.v = b.vec_id) WHERE rn <= $graphK),
       |$rounds,
       |ref$sfx AS MATERIALIZED (SELECT u, v FROM ref$graphRounds$sfx)"""
      .stripMargin
  }

  /** The `n`-shaped CTE body (vec_id, iv, nrm, sb1, sb2) over an
    * arbitrary int-vector CTE — parameterized so q168's dup-injected
    * corpus (and q211's audit of its stored graph) run the identical
    * derivation under distinct CTE names. */
  private def graphNSqlNamed(name: String, src: String): String =
    s"""$name AS MATERIALIZED (SELECT vec_id, iv, label,
       |        CAST(list_aggregate(list_transform(iv, x -> x * x), 'sum')
       |          AS DOUBLE) AS nrm,
       |        list_aggregate(list_transform(generate_series(1, $graphBits),
       |          i -> CASE WHEN iv[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
       |               ELSE CAST(0 AS BIGINT) END), 'sum') AS sb1,
       |        list_aggregate(list_transform(
       |          generate_series($graphBits + 1, $graphBits + $graphBits),
       |          i -> CASE WHEN iv[i] > 0
       |               THEN CAST(1 AS BIGINT) << (i - $graphBits - 1)
       |               ELSE CAST(0 AS BIGINT) END), 'sum') AS sb2
       |      FROM $src)""".stripMargin

  /** The standard `n` over the plain corpus's `iv`. */
  private def graphNSql: String = graphNSqlNamed("n", "iv")

  /** The corpus CTE chain `iv` → `n` over the plain embeddings
    * table. */
  private val graphCorpusSql: String =
    s"iv AS ($intVecsSql),\n$graphNSql"

  /** Full-corpus construction: corpus + the unsuffixed chain, ending
    * at `ref(u, v)`. Shared by q164/q165/q166 so construction can
    * never drift between the build, search and maintenance queries. */
  private val graphSqlCtes: String =
    s"$graphCorpusSql,\n${graphChainSql("n", "")}"

  // ---- ORACLE-SIDE GRAPH FIXTURES (the [[graft.ops.Bpe.dtFixturePath]]
  // pattern): replaying graph CONSTRUCTION inside every consumer's
  // oracle makes the timed oracle pay build+probe while the engine
  // pays probe-only against its stamped store (ADVICE r10) — so the
  // three stored graphs get fixed-path mirrors that [[graft.Verify]]
  // materializes once per run from the engine stores, the consumer
  // oracles (q165/q166/q170/q175) read them, and q211 anchors every
  // mirror's CONTENT against the full construction replay (the q162
  // role). `tools/bench_oracle.py` rebuilds them in pure DuckDB from
  // the replay SQL below when timing at another scale factor, counted
  // once as `_fixture:` entries — build amortized identically on both
  // sides. Paths are fixed because oracle SQL is static text.

  /** Full-corpus refined graph `ref(u, v)` mirror. */
  val knnRefFixturePath = "/tmp/graft_fixtures/knn_ref.parquet"

  /** History-only graph `refh(u, v)` mirror (the q166/q170 base). */
  val knnRefhFixturePath = "/tmp/graft_fixtures/knn_refh.parquet"

  /** Layer-1 graph `refx1(u, v)` mirror (q175's middle layer). */
  val knnRefx1FixturePath = "/tmp/graft_fixtures/knn_refx1.parquet"

  /** Dup-injected-corpus graph `ref(u, v)` mirror (q168's candidate
    * structure — r18, closing the r17 asymmetry: q168 moved to a
    * stored engine graph without giving its oracle the mirror the
    * other four consumers have, so the bench yardstick kept charging
    * DuckDB full construction while Spark timed probe-only work). */
  val knnDup168FixturePath = "/tmp/graft_fixtures/knn_dup168.parquet"

  /** Standalone DuckDB replays producing each mirror's rows — dumped
    * by Verify as fixture_sql.json entries. Defs, not vals: they read
    * params declared later in this object (init order). */
  def knnRefReplaySql: String =
    s"WITH $graphCorpusSql,\n${graphChainSql("n", "")}\n" +
      "SELECT u, v FROM ref"

  def knnRefhReplaySql: String =
    s"""WITH $graphCorpusSql,
       |nh AS MATERIALIZED (SELECT * FROM n
       |      WHERE vec_id % $graphDeltaMod < $graphDeltaFrom),
       |${graphChainSql("nh", "h")}
       |SELECT u, v FROM refh""".stripMargin

  def knnRefx1ReplaySql: String =
    s"""WITH $graphCorpusSql,
       |nx1 AS MATERIALIZED (SELECT * FROM n WHERE vec_id % $layerMod = 0),
       |${graphChainSql("nx1", "x1")}
       |SELECT u, v FROM refx1""".stripMargin

  /** q168's dup-injected corpus as CTE text — `e` (base ∪ every-5th
    * vector re-appearing under vec_id+100000), its int-vector `iv`,
    * and the node CTE under the given names. Shared verbatim by the
    * q168 oracle (names e/iv/n), the dup168 mirror replay, and q211's
    * audit chain (names ed/ivd/nd) so the corpus derivation can never
    * drift between probe, replay, and anchor. */
  private def dup168CorpusCtes(e: String, iv: String, n: String): String =
    s"""$e AS (
       |  SELECT vec_id, label, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, label, embedding FROM embeddings
       |  WHERE vec_id % 5 = 0),
       |$iv AS (SELECT vec_id, label,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0)
       |             AS BIGINT)) AS iv
       |       FROM $e),
       |${graphNSqlNamed(n, iv)}""".stripMargin

  def knnDup168ReplaySql: String =
    s"""WITH ${dup168CorpusCtes("e", "iv", "n")},
       |${graphChainSql("n", "")}
       |SELECT u, v FROM ref""".stripMargin

  /** A mirror-reading CTE, same name/columns as the chain it
    * replaces. */
  private def fixtureRefCte(name: String, path: String): String =
    s"$name AS MATERIALIZED (SELECT u, v" +
      s" FROM read_parquet('$path/*.parquet'))"

  /** (path, content) for [[graft.Verify]]: each mirror materialized
    * from the engine's own stamped store — q211 is the anchor that
    * makes this trustworthy (mirror content ≡ full oracle replay). */
  def oracleGraphFixtures(s: SparkSession, d: String)
      : Seq[(String, DataFrame)] = {
    val isDelta = (col("vec_id") % graphDeltaMod) >= graphDeltaFrom
    Seq(
      knnRefFixturePath ->
        storedBuiltGraph(s, d, "full", None).select(col("u"), col("v")),
      knnRefhFixturePath ->
        storedBuiltGraph(s, d, "base", Some(!isDelta))
          .select(col("u"), col("v")),
      knnRefx1FixturePath ->
        storedLayeredEdges(s, d).filter(col("layer") === 1)
          .select(col("u"), col("v")),
      knnDup168FixturePath ->
        storedDup168Graph(s, d).select(col("u"), col("v")))
  }

  /** The stored LAYERED index's edge relation (u, v, layer) — q175's
    * engine-side state, also the q211 audit's l0/l1 subject. */
  private def storedLayeredEdges(s: SparkSession, d: String): DataFrame = {
    val tag = java.nio.file.Paths.get(d).getFileName.toString
      .replaceAll("[^A-Za-z0-9]", "_")
    val idx = s"${graft.ops.Fixtures.root(s)}/graph_index_layered/$tag"
    graft.ops.GraphIndex.ensureLayered(s, idx, graphVecs(s, d), graphK,
      graphRounds, Seq("sb1", "sb2"), layerMod, layerLevels,
      dataStamp(s, d), nHint = Some(corpusN(s, d)))
    s.read.parquet(s"$idx/edges")
  }

  /** q164 — k-NN GRAPH (NN-Descent shape) + RECALL AUDIT: build the
    * graph with [[graft.ops.KnnGraph]] (sign-bucket init, $graphRounds
    * neighbors-of-neighbors refinement rounds), then measure it — for
    * every audited node (vec_id % $graphAuditMod = 0) the exact integer
    * overlap between its graph neighbors and its TRUE top-k by
    * brute-force cosine, plus its degree. The graph is the standard
    * candidate structure for dedup/similarity at corpus scale; the
    * audit is its accuracy dial (the q150 protocol applied to graph
    * construction). The oracle replays construction bit-for-bit, so
    * hash-green proves blocking + refinement + ranking end to end.
    *
    * Scale shape (100 TB): construction is [[graft.ops.KnnGraph]]'s
    * bounded joins (Σ n_b² init pairs, (2k)² refinement fan-out per
    * node, no corpus²); the brute audit pass costs one broadcast scan
    * per SAMPLED node — the recall-audit protocol, never run over the
    * full corpus. The audited × corpus inequality join is an
    * intentional bounded BNLJ (≤ |audit| rows broadcast). */
  /** True top-$graphK edges for the audited nodes by brute-force exact
    * cosine — the ground truth every graph variant is measured
    * against. The audited × corpus inequality join is an intentional
    * bounded BNLJ (≤ |audit| rows broadcast). */
  private def bruteEdges(vecs: DataFrame, audited: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u")).orderBy(col("cosine").desc, col("v"))
    vecs.as("b").join(
        broadcast(audited.select(col("vec_id").as("u"),
          col("embedding").as("ea"))),
        col("u") =!= col("b.vec_id"))
      .select(col("u"), col("b.vec_id").as("v"),
        graft.functions.CosineScaled(col("ea"), col("b.embedding"))
          .as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= graphK).select(col("u"), col("v"))
  }

  val q164 = Q("q164_knn_graph",
    (s, d) => {
      val vecs = graphVecs(s, d)
      val graph = graft.ops.KnnGraph.build(vecs, graphK,
        rounds = graphRounds, bucketCols = Seq("sb1", "sb2"),
        nHint = Some(corpusN(s, d)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val audited = vecs.filter(col("vec_id") % graphAuditMod === 0)
      val brute = bruteEdges(vecs, audited)
      val deg = graph.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      val ovl = graph.join(brute, Seq("u", "v"))
        .groupBy(col("u")).agg(count(lit(1)).as("n_overlap"))
      audited.select(col("vec_id"))
        .join(deg.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left")
        .join(ovl.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
    },
    Some(
      s"""WITH $graphSqlCtes,
         |aud AS (SELECT vec_id FROM n WHERE vec_id % $graphAuditMod = 0),
         |$bruteSqlCte,
         |deg AS (SELECT u, count(*) AS degree FROM ref GROUP BY 1),
         |ovl AS (SELECT r.u, count(*) AS n_overlap
         |        FROM ref r JOIN brute b ON r.u = b.u AND r.v = b.v
         |        GROUP BY 1)
         |SELECT a.vec_id,
         |  CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
         |  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap
         |FROM aud a LEFT JOIN deg d ON a.vec_id = d.u
         |  LEFT JOIN ovl o ON a.vec_id = o.u""".stripMargin))

  /** q165 — GRAPH-TRAVERSAL SEARCH (the HNSW search pattern as
    * dataflow): entry beam = top-$graphBeam of the query's sign bucket,
    * two hops over the undirected refined graph, exact rerank of
    * everything visited, top-k. Traversal-as-joins is the Spark-first
    * reading of greedy graph search: each hop is one equi-join on the
    * frontier (fan-out ≤ beam·(2k)^hop), so a 1000-executor cluster
    * runs the whole search as three bounded joins + one rerank — no
    * per-node sequential walk, no driver state. */
  /** Oracle side of [[graft.ops.KnnGraph.search]] over the graph CTE
    * `$graph`: query row, entry beam, two frontier hops, exact rerank
    * — the final SELECT included, so append after the graph chain. */
  private def graphSearchSql(graph: String): String =
    s"""q AS (SELECT iv AS qiv, nrm AS qnrm, sb1 AS qsb1, sb2 AS qsb2
       |      FROM n WHERE vec_id = $queryVecId),
       |entry AS (SELECT vec_id FROM (
       |    SELECT a.vec_id,
       |      row_number() OVER (ORDER BY ${cosQSql("a")} DESC, a.vec_id)
       |        AS rn
       |    FROM n a, q WHERE (a.sb1 = q.qsb1 OR a.sb2 = q.qsb2)
       |      AND a.vec_id <> $queryVecId)
       |  WHERE rn <= $graphBeam),
       |symr AS (SELECT u, v FROM $graph
       |         UNION SELECT v AS u, u AS v FROM $graph),
       |e1 AS (SELECT DISTINCT s.v AS vec_id
       |       FROM entry e JOIN symr s ON e.vec_id = s.u),
       |e2 AS (SELECT DISTINCT s.v AS vec_id
       |       FROM e1 JOIN symr s ON e1.vec_id = s.u),
       |vis AS (SELECT vec_id FROM (
       |          SELECT vec_id FROM entry
       |          UNION SELECT vec_id FROM e1
       |          UNION SELECT vec_id FROM e2)
       |        WHERE vec_id <> $queryVecId)
       |SELECT a.vec_id, ${cosQSql("a")} AS cosine
       |FROM n a JOIN vis USING (vec_id), q
       |ORDER BY cosine DESC, a.vec_id LIMIT $topK""".stripMargin

  val q165 = Q("q165_graph_search",
    (s, d) => {
      // the graph is the search's PRE-EXISTING state (built once per
      // corpus generation — [[storedBuiltGraph]]); the timed query is
      // the traversal alone: entry beam, two frontier-hop joins over
      // the stored edges, exact rerank
      val vecs = graphVecs(s, d)
      graft.ops.KnnGraph.search(vecs,
        storedBuiltGraph(s, d, "full", None),
        queryVecId, graphBeam, topK, Seq("sb1", "sb2"))
    },
    Some(s"WITH $graphCorpusSql,\n" +
      s"${fixtureRefCte("ref", knnRefFixturePath)},\n" +
      s"${graphSearchSql("ref")}"))

  /** Oracle replay of [[graft.ops.KnnGraph.maintain]] on the q150
    * delta split: history/delta corpus slices, the history-only chain
    * (suffix `h`), then the two delta-proportional maintenance steps,
    * ending at `maint(u, v)` — the maintained directed graph. Shared
    * by q166 (audit) and q170 (stored-index search) so maintenance
    * can never drift between them. Expects `n` to exist.
    * `historyChain` supplies the `refh(u, v)` base graph: the timed
    * consumers read the stored mirror ([[knnRefhFixturePath]]); the
    * correctness-only q171 audit replays the full history build
    * inline and thereby anchors that mirror's derivation. */
  private def graphMaintSqlCtes(historyChain: String): String =
    s"""nh AS MATERIALIZED (SELECT * FROM n
       |      WHERE vec_id % $graphDeltaMod < $graphDeltaFrom),
       |nd AS MATERIALIZED (SELECT * FROM n
       |      WHERE vec_id % $graphDeltaMod >= $graphDeltaFrom),
       |$historyChain,
       |newc AS (SELECT DISTINCT u, v FROM (
       |    SELECT a.vec_id AS u, b.vec_id AS v
       |    FROM nd a JOIN n b ON a.sb1 = b.sb1 AND a.vec_id <> b.vec_id
       |    UNION ALL
       |    SELECT a.vec_id, b.vec_id
       |    FROM nd a JOIN n b ON a.sb2 = b.sb2 AND a.vec_id <> b.vec_id
       |    UNION ALL
       |    SELECT am.u, r.v FROM (
       |      SELECT a.vec_id AS u, m.vec_id AS mid
       |      FROM nd a JOIN nh m ON a.sb1 = m.sb1
       |      UNION ALL
       |      SELECT a.vec_id, m.vec_id
       |      FROM nd a JOIN nh m ON a.sb2 = m.sb2) am
       |    JOIN refh r ON r.u = am.mid WHERE am.u <> r.v)),
       |newe AS (SELECT u, v FROM (SELECT c.u, c.v,
       |      row_number() OVER (PARTITION BY c.u
       |        ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rn
       |    FROM newc c JOIN n a ON c.u = a.vec_id
       |      JOIN n b ON c.v = b.vec_id) WHERE rn <= $graphK),
       |hc AS (SELECT DISTINCT u, v FROM (
       |    SELECT a.vec_id AS u, b.vec_id AS v
       |    FROM nh a JOIN nd b ON a.sb1 = b.sb1
       |    UNION ALL
       |    SELECT a.vec_id, b.vec_id
       |    FROM nh a JOIN nd b ON a.sb2 = b.sb2
       |    UNION ALL
       |    SELECT u, v FROM refh)),
       |upd AS (SELECT u, v FROM (SELECT c.u, c.v,
       |      row_number() OVER (PARTITION BY c.u
       |        ORDER BY ${cosSql("a", "b")} DESC, c.v) AS rn
       |    FROM hc c JOIN n a ON c.u = a.vec_id
       |      JOIN n b ON c.v = b.vec_id) WHERE rn <= $graphK),
       |maint AS MATERIALIZED (SELECT u, v FROM upd
       |    UNION ALL SELECT u, v FROM newe)""".stripMargin

  /** q166 — INCREMENTAL k-NN-GRAPH MAINTENANCE: the growing-corpus
    * operation (the graph sibling of q96's dedup-index delta and
    * q138's ANN delta-append). The corpus splits on the q150
    * convention (vec_id % $graphDeltaMod >= $graphDeltaFrom is the
    * delta); the base graph is built over history only, then
    * [[graft.ops.KnnGraph.maintain]] grafts the delta on with
    * delta-proportional joins — new nodes get bucket-mates plus one
    * hop through a bucket-mate's existing edges; old nodes re-rank
    * their edge set against delta bucket-mates only. The output is
    * the maintained graph's own edges for the audited nodes — an
    * edge-level hash check of maintenance itself, with NO audit
    * recomputation in the timed path (the full maintained-vs-rebuilt
    * -vs-brute audit lives in the correctness-only [[q171]]; the q21
    * precedent — time the shipping operator, register the audit
    * separately).
    *
    * Scale shape (100 TB): maintenance touches O(|delta|·blockwidth +
    * |affected hist|·k) rows — a rebuild is a full corpus pass; this
    * is why a stored graph index is maintainable at all. */
  val q166 = Q("q166_knn_graph_maintain",
    (s, d) => {
      // the base graph is the protocol's PRE-EXISTING state — the very
      // thesis of maintenance is NOT rebuilding it ([[storedBuiltGraph]],
      // built once per corpus generation); the timed query is the
      // delta-proportional maintain dataflow alone
      val bc = Seq("sb1", "sb2")
      val vecs = graphVecs(s, d)
      val isDelta = (col("vec_id") % graphDeltaMod) >= graphDeltaFrom
      val base = storedBuiltGraph(s, d, "base", Some(!isDelta))
      val maint = graft.ops.KnnGraph.maintain(vecs, base, isDelta, graphK, bc)
      maint.filter(col("u") % graphAuditMod === 0)
        .select(col("u"), col("v"))
    },
    Some(
      s"""WITH $graphCorpusSql,
         |${graphMaintSqlCtes(fixtureRefCte("refh", knnRefhFixturePath))}
         |SELECT u, v FROM maint WHERE u % $graphAuditMod = 0"""
        .stripMargin))

  /** q171 — MAINTENANCE AUDIT (correctness-only; [[Q.benchExcluded]]):
    * the maintained graph measured per sampled node against BOTH
    * yardsticks — the full rebuild (how much does skipping the
    * rebuild cost?) and the brute-force truth (is it still a good
    * graph?). Exact integer overlaps; the oracle replays
    * history-build, maintenance AND rebuild bit-for-bit. This is
    * deliberately ~3× the shipping work (q166), which is why it stays
    * out of the timed bench: an audit is something you run when you
    * turn the accuracy dial, not per query. */
  val q171 = Q("q171_knn_graph_maintain_audit",
    (s, d) => {
      val bc = Seq("sb1", "sb2")
      val vecs = graphVecs(s, d)
      val isDelta = (col("vec_id") % graphDeltaMod) >= graphDeltaFrom
      val base = graft.ops.KnnGraph.build(vecs.filter(!isDelta), graphK,
        rounds = graphRounds, bucketCols = bc,
        nHint = Some(corpusN(s, d)))
      val maint = graft.ops.KnnGraph.maintain(vecs, base, isDelta, graphK, bc)
      val rebuilt = graft.ops.KnnGraph.build(vecs, graphK,
        rounds = graphRounds, bucketCols = bc,
        nHint = Some(corpusN(s, d)))
      val audited = vecs.filter(col("vec_id") % graphAuditMod === 0)
      val deg = maint.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      val ovr = maint.join(rebuilt, Seq("u", "v"))
        .groupBy(col("u")).agg(count(lit(1)).as("n_overlap_rebuild"))
      val ovt = maint.join(bruteEdges(vecs, audited), Seq("u", "v"))
        .groupBy(col("u")).agg(count(lit(1)).as("n_overlap_true"))
      audited.select(col("vec_id"))
        .join(deg.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left")
        .join(ovr.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left")
        .join(ovt.withColumnRenamed("u", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("n_overlap_rebuild"), lit(0L)).as("n_overlap_rebuild"),
          coalesce(col("n_overlap_true"), lit(0L)).as("n_overlap_true"))
    },
    Some(
      s"""WITH $graphCorpusSql,
         |${graphChainSql("n", "")},
         |${graphMaintSqlCtes(graphChainSql("nh", "h"))},
         |aud AS (SELECT vec_id FROM n WHERE vec_id % $graphAuditMod = 0),
         |$bruteSqlCte,
         |deg AS (SELECT u, count(*) AS degree FROM maint GROUP BY 1),
         |ovr AS (SELECT m.u, count(*) AS n_overlap_rebuild
         |        FROM maint m JOIN ref r ON m.u = r.u AND m.v = r.v
         |        GROUP BY 1),
         |ovt AS (SELECT m.u, count(*) AS n_overlap_true
         |        FROM maint m JOIN brute b ON m.u = b.u AND m.v = b.v
         |        GROUP BY 1)
         |SELECT a.vec_id,
         |  CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
         |  CAST(COALESCE(r.n_overlap_rebuild, 0) AS BIGINT)
         |    AS n_overlap_rebuild,
         |  CAST(COALESCE(t.n_overlap_true, 0) AS BIGINT) AS n_overlap_true
         |FROM aud a LEFT JOIN deg d ON a.vec_id = d.u
         |  LEFT JOIN ovr r ON a.vec_id = r.u
         |  LEFT JOIN ovt t ON a.vec_id = t.u""".stripMargin))

  /** q167 — LATE-INTERACTION RETRIEVAL (the ColBERT MaxSim shape):
    * documents carry MULTIPLE vectors (here the corpus is re-read as
    * 5-token pseudo-docs, doc_id = vec_id / 5), the query is itself a
    * token bag (doc 0's 5 vectors), and a document scores
    * Σ_{query token} max_{doc token} cos(qt, dt) — each query token
    * finds its best match in the document, scores add. Per-token maxes
    * are micro-quantized (×10¹²) to integers before the sum, so the
    * score is an exact 64-bit aggregate — order-free, hash-green
    * across engines (the q66 recipe).
    *
    * Scale shape (100 TB): the query bag broadcasts; one corpus scan
    * computes all (doc token × query token) cosines map-side; both
    * aggregations (max per (doc, qt), sum per doc) are partial-agg
    * combinable; top-k is TakeOrdered. No joins between big
    * relations, no shuffle wider than (docs × |Q|) rows. */
  val q167 = {
    val tokensPerDoc = 5L
    val queryDoc = 0L
    Q("q167_late_interaction",
      (s, d) => {
        val toks = intVecs(s, d)
          .select(col("vec_id"),
            // integral `div`, not double `/`+cast: exact for the full
            // 64-bit id range (a double round-trips only to 2^53)
            expr(s"vec_id div $tokensPerDoc").as("doc_id"), col("iv"))
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
        val q = toks.filter(col("doc_id") === queryDoc)
          .select(col("vec_id").as("qt"), col("iv").as("qiv"),
            col("nrm").as("qnrm"))
        toks.filter(col("doc_id") =!= queryDoc)
          .crossJoin(broadcast(q))
          .select(col("doc_id"), col("qt"),
            Similarity.cosineFrom(col("iv"), col("qiv"),
              col("nrm"), col("qnrm")).as("cosine"))
          .groupBy(col("doc_id"), col("qt"))
          .agg(max(col("cosine")).as("best"))
          .select(col("doc_id"),
            round(col("best") * 1e12).cast("bigint").as("best_micro"))
          .groupBy(col("doc_id"))
          .agg(sum(col("best_micro")).as("maxsim"))
          .orderBy(col("maxsim").desc, col("doc_id")).limit(topK)
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |t AS (SELECT vec_id, vec_id // $tokensPerDoc AS doc_id, iv,
           |        CAST(list_aggregate(list_transform(iv, x -> x * x),
           |          'sum') AS DOUBLE) AS nrm
           |      FROM iv),
           |q AS (SELECT vec_id AS qt, iv AS qiv, nrm AS qnrm FROM t
           |      WHERE doc_id = $queryDoc),
           |best AS (SELECT doc_id, qt,
           |    max(CAST(list_aggregate(list_transform(generate_series(1, 64),
           |      i -> iv[i] * qiv[i]), 'sum') AS DOUBLE)
           |      / sqrt(nrm * qnrm)) AS best
           |  FROM t, q WHERE doc_id <> $queryDoc GROUP BY 1, 2)
           |SELECT doc_id,
           |  CAST(sum(CAST(round(best * 1e12) AS BIGINT)) AS BIGINT)
           |    AS maxsim
           |FROM best GROUP BY 1
           |ORDER BY maxsim DESC, doc_id LIMIT $topK""".stripMargin))
  }

  /** q168 — GRAPH-BASED SEMANTIC DEDUP: the kNN graph as the candidate
    * structure for near-dup clustering — keep only edges with cosine ≥
    * the dup threshold, then resolve transitive clusters with the
    * engine's connected-components machinery (q61's). Where q84
    * (SemDeDup) pays Σ_blocks n_b² pairwise work inside quantizer
    * blocks, the graph caps candidate scoring at k·N edges — the
    * standard route when blocks skew large. Corpus is q84's
    * dup-injection (every 5th vector re-appears under vec_id+100000),
    * and the spec-pinned mutual-NN guarantee for exact duplicates makes
    * the injected pairs provably edges, so every injected cluster is
    * found. Output: (vec_id, rep) per vector, rep = min id reachable
    * through ≥-threshold edges; the oracle replays construction and
    * resolves reachability with a recursive CTE.
    *
    * The candidate GRAPH comes from a stored fixture (r17): like
    * q165/q166/q170/q175, the dedup operator consumes a graph a
    * deployment builds once per corpus generation and maintains
    * incrementally — construction itself is benched by q164 (sign
    * init) and q221 (quantizer init), so re-paying the full NN-Descent
    * build inside the dedup query measured construction twice and the
    * dedup dataflow (edge re-score at the threshold + components) not
    * at all. The fixture stamp carries the data generation, every
    * graph parameter AND the dup-injection recipe. The oracle reads
    * the [[knnDup168FixturePath]] mirror (r18 — the same probe-only
    * symmetry as the other four consumers; r17 had left this oracle
    * replaying construction, which made the bench yardstick charge
    * DuckDB build+probe against Spark's probe-only side); q211
    * hash-anchors the mirror's content against the full DuckDB
    * construction replay, so a stale or wrong stored graph still
    * fails the gate. */
  /** q168's dup-injected corpus (engine side of
    * [[dup168CorpusCtes]]). */
  private def dup168Corpus(s: SparkSession, d: String): DataFrame = {
    val e = Catalog.embeddings(s, d).select(col("vec_id"), col("embedding"))
    e.unionAll(e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
  }

  /** q168's stored candidate graph over the dup-injected corpus —
    * also the source of the [[knnDup168FixturePath]] oracle mirror
    * and a q211 audit subject. */
  private def storedDup168Graph(s: SparkSession, d: String): DataFrame = {
      val store = s"${graft.ops.Fixtures.root(s)}/knn_graph_dup168_" +
        graft.ops.Fixtures.pathKey(d)
      val stamp = graft.ops.Fixtures.datasetStamp(s, s"$d/embeddings.parquet") +
        s"|k=$graphK|rounds=$graphRounds|${initToken(s, d)}|dup=mod5+100000" +
        s"|algo=${graft.ops.KnnGraph.algoVersion}|fmt=1"
      graft.ops.Fixtures.ensure(s, store, stamp) { stg =>
        val iv = Similarity.intVec(col("embedding"))
        // same init-key policy as graphVecs (the dup injection is a
        // fixed 1.2× of the base corpus — one policy source)
        val vecs = graft.ops.KnnGraph
          .withInitBuckets(
            dup168Corpus(s, d).select(col("vec_id"), col("embedding"),
              iv.as("iv")),
            effectiveInitKind(s, d),
            nTrainHint = Some(corpusN(s, d) + corpusN(s, d) / 5))
          .drop("iv")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.ops.KnnGraph.build(vecs, graphK,
            rounds = graphRounds, bucketCols = Seq("sb1", "sb2"),
            nHint = Some(corpusN(s, d) + corpusN(s, d) / 5))
          .write.mode("overwrite").parquet(stg)
        vecs.unpersist()
      }
      s.read.parquet(store)
  }

  val q168 = {
    val thr = 0.99
    Q("q168_graph_semantic_dedup",
      (s, d) => {
        // post-construction the dedup needs only (vec_id, embedding):
        // the blocking keys exist to build the graph, not to score its
        // edges or resolve components
        val corpus = dup168Corpus(s, d)
        val strong = graft.ops.KnnGraph.score(storedDup168Graph(s, d), corpus)
          .filter(col("cosine") >= thr)
          .select(col("u").as("doc_a"), col("v").as("doc_b"))
        graft.ops.Dedup.connectedComponents(
            corpus.select(col("vec_id").as("doc_id")), strong)
          .select(col("doc_id").as("vec_id"), col("rep"))
      },
      Some(
        s"""WITH RECURSIVE ${dup168CorpusCtes("e", "iv", "n")},
           |${fixtureRefCte("ref", knnDup168FixturePath)},
           |strong AS MATERIALIZED (SELECT r.u, r.v FROM ref r
           |    JOIN n a ON r.u = a.vec_id JOIN n b ON r.v = b.vec_id
           |    WHERE ${cosSql("a", "b")} >= $thr),
           |edges AS (SELECT u AS a, v AS b FROM strong
           |          UNION ALL SELECT v, u FROM strong),
           |reach(v, r) AS (
           |  SELECT vec_id, vec_id FROM n
           |  UNION
           |  SELECT e2.a, reach.r FROM edges e2 JOIN reach ON reach.v = e2.b)
           |SELECT v AS vec_id, min(r) AS rep FROM reach GROUP BY 1"""
          .stripMargin))
  }

  /** q169 — HYBRID RETRIEVAL FUSION (reciprocal-rank fusion): the
    * standard way a production retrieval stack combines a sparse
    * (BM25, q109) and a dense (cosine top-k, q23) ranking — score =
    * Σ_lists 1/(60 + rank), micro-quantized to exact integers per
    * list before the (fixed 2-term) sum. Composes the EXISTING
    * queries and their oracles (the q153 pattern), so the fusion can
    * never drift from the rankings it fuses; documents and embeddings
    * share the id space (TESTDATA), doc_id = vec_id.
    *
    * Scale shape (100 TB): both input rankings are top-k lists (≤ 10
    * rows each) — the fusion itself is a full-outer join of two tiny
    * relations; total cost IS the two retrievers, which each scan
    * once with broadcast query state. */
  val q169 = {
    val rrfK = 60
    def contrib(r: Column): Column =
      coalesce(round(lit(1e12) / (lit(rrfK.toDouble) + r.cast("double")))
        .cast("bigint"), lit(0L))
    Q("q169_hybrid_rrf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sparse = TextQueries.q109.run(s, d)
          .withColumn("sr", row_number().over(
            Window.orderBy(col("score_micro").desc, col("doc_id"))))
          .select(col("doc_id"), col("sr"))
        val dense = q23.run(s, d)
          .withColumn("dr", row_number().over(
            Window.orderBy(col("cosine").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("dr"))
        sparse.join(dense, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (contrib(col("sr")) + contrib(col("dr"))).as("rrf_micro"))
          .orderBy(col("rrf_micro").desc, col("doc_id")).limit(topK)
      },
      for {
        bm25Sql <- TextQueries.q109.oracle
        bruteSql <- q23.oracle
      } yield
        s"""WITH sparse0 AS (__BM25__),
           |dense0 AS (__BRUTE__),
           |sp AS (SELECT doc_id,
           |         row_number() OVER (ORDER BY score_micro DESC, doc_id)
           |           AS sr
           |       FROM sparse0),
           |de AS (SELECT vec_id AS doc_id,
           |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS dr
           |       FROM dense0),
           |f AS (SELECT COALESCE(sp.doc_id, de.doc_id) AS doc_id,
           |        sp.sr, de.dr
           |      FROM sp FULL OUTER JOIN de ON sp.doc_id = de.doc_id)
           |SELECT doc_id,
           |  (COALESCE(CAST(round(1e12 / ($rrfK + sr)) AS BIGINT), 0)
           |   + COALESCE(CAST(round(1e12 / ($rrfK + dr)) AS BIGINT), 0))
           |    AS rrf_micro
           |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT $topK""".stripMargin
          .replace("__BM25__", bm25Sql)
          .replace("__BRUTE__", bruteSql))
  }

  /** q170 — PERSISTENT GRAPH INDEX: the stored-index lifecycle for
    * the graph family (the graph sibling of q138's stored IVF):
    * [[graft.ops.GraphIndex]] builds over history and persists the
    * edge relation, absorbs the delta with the maintenance joins and
    * a staged swap (never a rebuild), then answers the query by
    * traversing the STORED edges. Construction is stamped against the
    * data generation ([[graft.ops.GraphIndex.ensure]]): a repeat run
    * on unchanged data reuses the store and pays only the search —
    * deterministic either way, because the stored content is a pure
    * function of (data, params). The oracle replays history-build +
    * maintenance + search — searching its replayed `maint` relation —
    * so hash-green proves the persisted index holds exactly the
    * maintained graph.
    *
    * Scale shape (100 TB): the stored relation is k rows per vector;
    * maintenance I/O is one staged rewrite of it, search reads it
    * once per hop — the index amortizes construction across every
    * query, which is the point of persisting it. */
  val q170 = Q("q170_persistent_graph_index",
    (s, d) => {
      val bc = Seq("sb1", "sb2")
      val tag = java.nio.file.Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val idx = s"${graft.ops.Fixtures.root(s)}/graph_index/$tag"
      val vecs = graphVecs(s, d)
      val isDelta = (col("vec_id") % graphDeltaMod) >= graphDeltaFrom
      val stamp = dataStamp(s, d)
      graft.ops.GraphIndex.ensure(s, idx, vecs, isDelta, graphK,
        graphRounds, bc, stamp, nHint = Some(corpusN(s, d)))
      graft.ops.GraphIndex.search(s, idx, vecs, queryVecId, graphBeam,
        topK, bc)
    },
    Some(s"WITH $graphCorpusSql,\n" +
      s"${graphMaintSqlCtes(fixtureRefCte("refh", knnRefhFixturePath))},\n" +
      graphSearchSql("maint")))

  /** q174 — BATCH-QUERY RETRIEVAL: the production serving shape.
    * q23/q56/q68/q165/q167/q169 all serve exactly ONE query vector via
    * a 1-row broadcast; a retrieval system serves a query SET — here
    * every vec_id % $batchQMod = 0 (the sampled query batch — 20 queries at sf0.1) gets its
    * own IVF-probed top-$topK in ONE dataflow:
    *
    *  - coarse, per (cell, query): centroid cosine, window-ranked to
    *    the best $probes cells PER QUERY — the probe set is a small
    *    (|Q|·probes)-row relation, broadcastable;
    *  - fine: corpus ⋈ probe-set on the cell id (an equi join — each
    *    corpus row fans out only to the queries that probed its cell,
    *    ≈ N·|Q|·probes/C scored pairs, never corpus × |Q|), exact
    *    cosine, rank-bounded top-k per query via one window.
    *
    * No cartesian anywhere: the only corpus-sized input enters one
    * broadcast-hash equi join keyed on the cell. At 100 TB the corpus
    * is partitioned by cell id, so the probe join doubles as partition
    * pruning, and |Q| scales to millions because per-query state is
    * probes + k rows — this is exactly the batch (offline) serving
    * layout. Self-matches excluded per query. */
  val q174 = {
    val batchQMod = 100L
    Q("q174_batch_retrieval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = intVecs(s, d)
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // NOT pinned (r19 A/B): the query batch is consumed three times,
        // but each consumer is a broadcast build that is its own job
        // regardless, and all three re-filters read the cached corpus —
        // pinning ADDED stage-jobs (17 → 20 in DriverFloorProbe) for
        // zero task-time cut, the inverse of the q24/q68 result
        val qs = e.filter(col("vec_id") % batchQMod === 0)
          .select(col("vec_id").as("query_id"), col("iv").as("qiv"),
            col("nrm").as("qnrm"))
        // coarse stage over exploded dims (integer centroids, q24's
        // quantizer: the stored `label` cell)
        val dims = e.select(col("vec_id"), col("label"),
            posexplode(col("iv")))
          .withColumnRenamed("pos", "p").withColumnRenamed("col", "x")
        val cent = dims.groupBy(col("label"), col("p"))
          .agg(round(sum(col("x")).cast("double") / count(lit(1)))
            .cast("bigint").as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cnrm = cent.groupBy(col("label"))
          .agg(sum(col("c") * col("c")).cast("double").as("cnrm"))
        val qdims = qs.select(col("query_id"), posexplode(col("qiv")))
          .withColumnRenamed("pos", "qp").withColumnRenamed("col", "qx")
        val cdot = cent.join(broadcast(qdims), col("p") === col("qp"))
          .groupBy(col("label"), col("query_id"))
          .agg(sum(col("c") * col("qx")).cast("double").as("cdot"))
        val cellW = Window.partitionBy(col("query_id"))
          .orderBy(col("cscore").desc, col("label"))
        val cells = cdot.join(cnrm, "label")
          .join(broadcast(qs.select(col("query_id"), col("qnrm"))),
            "query_id")
          .select(col("query_id"), col("label"),
            (col("cdot") / sqrt(col("cnrm") * col("qnrm"))).as("cscore"))
          .withColumn("rn", row_number().over(cellW))
          .filter(col("rn") <= probes)
          .select(col("query_id"), col("label"))
        // fine stage: ONE equi join corpus ⋈ probe-set on the cell
        val rankW = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        e.join(broadcast(cells), "label")
          .filter(col("vec_id") =!= col("query_id"))
          .join(broadcast(qs), "query_id")
          .select(col("query_id"), col("vec_id"),
            Similarity.cosineFrom(col("iv"), col("qiv"),
              col("nrm"), col("qnrm")).as("cosine"))
          .withColumn("rank", row_number().over(rankW))
          .filter(col("rank") <= topK)
          .select(col("query_id"), col("rank").cast("bigint").as("rank"),
            col("vec_id"), col("cosine"))
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |n AS (SELECT *, CAST(list_aggregate(list_transform(iv,
           |        x -> x * x), 'sum') AS DOUBLE) AS nrm FROM iv),
           |q AS (SELECT vec_id AS query_id, iv AS qiv, nrm AS qnrm
           |      FROM n WHERE vec_id % $batchQMod = 0),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, label, p, iv[p] AS x FROM iv, pos),
           |cent AS (SELECT label, p,
           |           CAST(round(CAST(sum(x) AS DOUBLE) / count(*))
           |             AS BIGINT) AS c
           |         FROM dims GROUP BY 1, 2),
           |cnrm AS (SELECT label, CAST(sum(c * c) AS DOUBLE) AS cnrm
           |         FROM cent GROUP BY 1),
           |qdims AS (SELECT query_id, p AS qp, qiv[p] AS qx
           |          FROM q, pos),
           |cdot AS (SELECT c.label, d.query_id,
           |           CAST(sum(c.c * d.qx) AS DOUBLE) AS cdot
           |         FROM cent c JOIN qdims d ON c.p = d.qp GROUP BY 1, 2),
           |cells AS (SELECT query_id, label FROM (
           |    SELECT t.query_id, t.label,
           |      row_number() OVER (PARTITION BY t.query_id
           |        ORDER BY t.cdot / sqrt(n.cnrm * q.qnrm) DESC, t.label)
           |        AS rn
           |    FROM cdot t JOIN cnrm n USING (label)
           |      JOIN q ON q.query_id = t.query_id) WHERE rn <= $probes)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
           |FROM (
           |  SELECT c.query_id, a.vec_id,
           |    CAST(list_aggregate(list_transform(generate_series(1, 64),
           |      i -> a.iv[i] * q.qiv[i]), 'sum') AS DOUBLE)
           |      / sqrt(a.nrm * q.qnrm) AS cosine,
           |    row_number() OVER (PARTITION BY c.query_id
           |      ORDER BY CAST(list_aggregate(list_transform(
           |          generate_series(1, 64), i -> a.iv[i] * q.qiv[i]),
           |          'sum') AS DOUBLE) / sqrt(a.nrm * q.qnrm) DESC,
           |        a.vec_id) AS rank
           |  FROM n a JOIN cells c ON a.label = c.label
           |    JOIN q ON q.query_id = c.query_id
           |  WHERE a.vec_id <> c.query_id)
           |WHERE rank <= $topK""".stripMargin))
  }

  private val layerMod = 10L
  private val layerLevels = 2

  /** q175 — LAYERED GRAPH SEARCH over a STORED index (true HNSW
    * hierarchy): [[graft.ops.KnnGraph.buildLayers]] persists one
    * (u, v, layer) relation — layer 0 the full graph, layer ℓ a graph
    * over the deterministic 1/$layerMod^ℓ node sample — and search
    * greedy-descends: score the (tiny) top layer outright, then one
    * bounded hop + re-beam per layer, two hops + exact rerank at
    * layer 0. Depth is O(log N) layers where q165's flat search pays
    * a bucket scan (~N/2^bits entry candidates) + fixed 2-hop
    * frontier; here the entry stage scores N/$layerMod^$layerLevels
    * nodes and each descent step ≤ beam·(2k+1). Same stamped stored
    * lifecycle as q170 (repeat runs reuse the store). The oracle
    * reads the layer graphs from the stored mirrors
    * ([[knnRefFixturePath]]/[[knnRefx1FixturePath]] — content
    * anchored by q211's full-replay audit) and replays the full
    * descent — hash-green pins the hierarchy's use + descent, while
    * construction is pinned by the anchor. */
  val q175 = Q("q175_layered_graph_search",
    (s, d) => {
      val tag = java.nio.file.Paths.get(d).getFileName.toString
        .replaceAll("[^A-Za-z0-9]", "_")
      val idx = s"${graft.ops.Fixtures.root(s)}/graph_index_layered/$tag"
      val vecs = graphVecs(s, d)
      graft.ops.GraphIndex.ensureLayered(s, idx, vecs, graphK,
        graphRounds, Seq("sb1", "sb2"), layerMod, layerLevels,
        dataStamp(s, d), nHint = Some(corpusN(s, d)))
      graft.ops.GraphIndex.searchLayered(s, idx, vecs, queryVecId,
        graphBeam, topK, layerMod, layerLevels)
    },
    Some {
      val topMod = math.pow(layerMod.toDouble, layerLevels.toDouble).toLong
      s"""WITH $graphCorpusSql,
         |${fixtureRefCte("ref", knnRefFixturePath)},
         |${fixtureRefCte("refx1", knnRefx1FixturePath)},
         |q AS (SELECT iv AS qiv, nrm AS qnrm FROM n
         |      WHERE vec_id = $queryVecId),
         |ent2 AS (SELECT vec_id FROM (
         |    SELECT a.vec_id,
         |      row_number() OVER (ORDER BY ${cosQSql("a")} DESC, a.vec_id)
         |        AS rn
         |    FROM n a, q WHERE a.vec_id % $topMod = 0)
         |  WHERE rn <= $graphBeam),
         |symr1 AS (SELECT u, v FROM refx1
         |          UNION SELECT v AS u, u AS v FROM refx1),
         |c1 AS (SELECT vec_id FROM ent2
         |       UNION SELECT s.v FROM ent2 e JOIN symr1 s ON e.vec_id = s.u),
         |ent1 AS (SELECT vec_id FROM (
         |    SELECT a.vec_id,
         |      row_number() OVER (ORDER BY ${cosQSql("a")} DESC, a.vec_id)
         |        AS rn
         |    FROM n a JOIN c1 USING (vec_id), q)
         |  WHERE rn <= $graphBeam),
         |symr0 AS (SELECT u, v FROM ref
         |          UNION SELECT v AS u, u AS v FROM ref),
         |h1 AS (SELECT vec_id FROM ent1
         |       UNION SELECT s.v FROM ent1 e JOIN symr0 s ON e.vec_id = s.u),
         |h2 AS (SELECT vec_id FROM h1
         |       UNION SELECT s.v FROM h1 e JOIN symr0 s ON e.vec_id = s.u)
         |SELECT a.vec_id, ${cosQSql("a")} AS cosine
         |FROM n a JOIN h2 USING (vec_id), q
         |WHERE a.vec_id <> $queryVecId
         |ORDER BY cosine DESC, a.vec_id LIMIT $topK""".stripMargin
    })

  /** q177 — HARD-NEGATIVE MINING: the contrastive-training data prep
    * (DPR/SimCSE recipe) — for every sampled anchor
    * (vec_id % $graphAuditMod = 0), its best same-label neighbor (the
    * positive) and the $negK highest-cosine DIFFERENT-label neighbors
    * (the hard negatives: near in embedding space, wrong by label —
    * exactly the pairs a contrastive loss learns most from; random
    * negatives are trivially separable). Candidates come from the
    * multi-table sign-bucket blocks (the q164 init key), so the pair
    * set is Σ n_b² bounded — never anchors × corpus; scoring is two
    * hash joins + one per-anchor window. Integer-scaled cosines keep
    * the ranking bit-reproducible for the oracle replay. */
  val q177 = {
    val negK = 3
    Q("q177_hard_negative_mining",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val vecs = graphVecs(s, d)
        val anchors = vecs.filter(col("vec_id") % graphAuditMod === 0)
        val pairs = Seq("sb1", "sb2").map { c =>
          anchors.as("a").join(vecs.as("b"),
              col(s"a.$c") === col(s"b.$c") &&
                col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("anchor_id"),
              col("b.vec_id").as("cand_id"))
        }.reduce(_ unionByName _).distinct()
        val scored = pairs
          .join(vecs.select(col("vec_id").as("anchor_id"),
            col("label").as("alabel"), col("embedding").as("ea")),
            "anchor_id")
          .join(vecs.select(col("vec_id").as("cand_id"),
            col("label").as("clabel"), col("embedding").as("eb")),
            "cand_id")
          .select(col("anchor_id"), col("cand_id"),
            (col("alabel") === col("clabel")).as("same"),
            graft.functions.CosineScaled(col("ea"), col("eb"))
              .as("cosine"))
        val w = Window.partitionBy(col("anchor_id"), col("same"))
          .orderBy(col("cosine").desc, col("cand_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter((col("same") && col("rn") === 1) ||
            (!col("same") && col("rn") <= negK))
          .select(col("anchor_id"),
            when(col("same"), lit("pos")).otherwise(lit("neg")).as("kind"),
            col("rn").cast("bigint").as("rank"), col("cand_id"),
            col("cosine"))
      },
      Some(
        s"""WITH $graphCorpusSql,
           |anch AS (SELECT * FROM n WHERE vec_id % $graphAuditMod = 0),
           |pairs AS (SELECT DISTINCT a.vec_id AS anchor_id,
           |            b.vec_id AS cand_id
           |          FROM anch a JOIN n b
           |            ON (a.sb1 = b.sb1 OR a.sb2 = b.sb2)
           |              AND a.vec_id <> b.vec_id),
           |sc AS (SELECT p.anchor_id, p.cand_id,
           |         (na.label = nb.label) AS same,
           |         ${cosSql("na", "nb")} AS cosine
           |       FROM pairs p JOIN n na ON p.anchor_id = na.vec_id
           |         JOIN n nb ON p.cand_id = nb.vec_id),
           |rk AS (SELECT *, row_number() OVER (
           |         PARTITION BY anchor_id, same
           |         ORDER BY cosine DESC, cand_id) AS rn
           |       FROM sc)
           |SELECT anchor_id,
           |  CASE WHEN same THEN 'pos' ELSE 'neg' END AS kind,
           |  CAST(rn AS BIGINT) AS rank, cand_id, cosine
           |FROM rk
           |WHERE (same AND rn = 1) OR (NOT same AND rn <= $negK)"""
          .stripMargin))
  }

  /** q179 — INT8 SCALAR-QUANTIZED ANN: per-dimension global min/max →
    * 8-bit codes (floor-scaled to 0..255), integer-dot-product scan for
    * candidates, exact full-precision rerank of the top 50. The
    * production memory play: codes are 8× smaller than the float
    * vectors (64 B vs 512 B per vector here), so the scan stage streams
    * 8× more corpus per byte of I/O and stays SIMD-friendly; accuracy
    * is recovered by reranking a candidate set that is O(k), not O(N).
    *
    * Everything is integer arithmetic — quantization uses `div` (floor
    * division on int64, exact in both engines; x ≥ mn so the dividend is
    * never negative), scores are int64 sums — so candidate selection is
    * bit-reproducible, and the final cosines reuse q23's exact integer
    * formulation. The min/max relation is one row per dimension (64),
    * broadcast; at 100 TB it is a metadata-sized artifact computed in
    * one map-side-combined pass.
    */
  val q179 = {
    val rerankK = 50
    Q("q179_int8_quantized_ann",
      (s, d) => {
        val dims = intVecs(s, d)
          .select(col("vec_id"), col("label"), posexplode(col("iv")))
          .withColumnRenamed("pos", "p").withColumnRenamed("col", "x")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mm = dims.groupBy(col("p"))
          .agg(min(col("x")).as("mn"), max(col("x")).as("mx")) // 64 rows
        // r = 255·x̂ — the dequantized value scaled integer-exact: the
        // stored artifact is the one-byte code c; r is recomputed at
        // scan time from c + the per-dim (mn, mx) metadata. Scoring raw
        // codes would be wrong: the 0..255 offset shifts every
        // dimension positive and the bias term swamps the dot product
        // (measured recall 0/10 vs 10/10 for reconstructed values).
        val codes = dims.join(broadcast(mm), Seq("p"))
          .select(col("vec_id"), col("label"), col("p"),
            expr("255 * mn + (CASE WHEN mx = mn THEN CAST(0 AS BIGINT)" +
              " ELSE ((x - mn) * 255) div (mx - mn) END) * (mx - mn)")
              .as("r"))
        val qc = codes.filter(col("vec_id") === queryVecId)
          .select(col("p").as("qp"), col("r").as("qr"))
        val cand = codes.filter(col("vec_id") =!= queryVecId)
          .join(broadcast(qc), col("p") === col("qp"))
          .groupBy(col("vec_id"), col("label"))
          .agg(sum(col("r") * col("qr")).as("score8"))
          .orderBy(col("score8").desc, col("vec_id")).limit(rerankK)
        val e = intVecs(s, d)
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
        val q = e.filter(col("vec_id") === queryVecId)
          .select(col("iv").as("qiv"), col("nrm").as("qnrm"))
        cand.join(e.select(col("vec_id"), col("iv"), col("nrm")), Seq("vec_id"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("label"), col("score8"),
            Similarity.cosineFrom(col("iv"), col("qiv"), col("nrm"),
              col("qnrm")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id")).limit(topK)
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |dims AS (
           |  SELECT vec_id, label, i AS p, iv[i] AS x
           |  FROM iv, unnest(generate_series(1, 64)) t(i)),
           |mm AS (SELECT p, min(x) AS mn, max(x) AS mx FROM dims GROUP BY 1),
           |codes AS (
           |  SELECT vec_id, label, p,
           |    255 * mn + (CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
           |         ELSE ((x - mn) * 255) // (mx - mn) END) * (mx - mn) AS r
           |  FROM dims JOIN mm USING (p)),
           |qc AS (SELECT p, r AS qr FROM codes WHERE vec_id = $queryVecId),
           |cand AS (
           |  SELECT vec_id, label, CAST(sum(r * qr) AS BIGINT) AS score8
           |  FROM codes JOIN qc USING (p) WHERE vec_id <> $queryVecId
           |  GROUP BY 1, 2 ORDER BY score8 DESC, vec_id LIMIT $rerankK),
           |n AS (SELECT *, CAST(list_aggregate(list_transform(iv, x -> x * x),
           |        'sum') AS DOUBLE) AS nrm FROM iv),
           |q AS (SELECT iv AS qiv, nrm AS qnrm FROM n WHERE vec_id = $queryVecId)
           |SELECT c.vec_id, c.label, c.score8,
           |  CAST(list_aggregate(list_transform(generate_series(1, 64),
           |    i -> iv[i] * qiv[i]), 'sum') AS DOUBLE) / sqrt(nrm * qnrm)
           |    AS cosine
           |FROM cand c JOIN n USING (vec_id), q
           |ORDER BY cosine DESC, vec_id LIMIT $topK""".stripMargin))
  }

  /** q181 — MATRYOSHKA TRUNCATION EVAL: search with only the first 16 of
    * 64 dimensions (the MRL deployment trick — a prefix of the embedding
    * is itself a usable lower-cost embedding) and grade each truncated
    * top-k hit against the full-precision top-k. The truncated scan
    * reads 1/4 of the vector bytes; the output is the truncated ranking
    * with an `in_full_topk` flag per row, so recall@k is `sum(hit)` for
    * the dial-turner reading it.
    *
    * Both rankings are exact integer dot products (q23's formulation) —
    * the comparison itself introduces no approximation. Scale shape: two
    * broadcast-query scans + a k-row join; the flag join is k×k at most.
    */
  val q181 = {
    val prefixDims = 16
    Q("q181_matryoshka_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = intVecs(s, d)
          .select(col("vec_id"), col("label"), col("iv"),
            slice(col("iv"), 1, prefixDims).as("iv16"))
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
          .withColumn("nrm16", Similarity.norm2(col("iv16")).cast("double"))
        val q = e.filter(col("vec_id") === queryVecId)
          .select(col("iv").as("qiv"), col("iv16").as("qiv16"),
            col("nrm").as("qnrm"), col("nrm16").as("qnrm16"))
        val body = e.filter(col("vec_id") =!= queryVecId)
          .crossJoin(broadcast(q))
        val trunc = body.select(col("vec_id"), col("label"),
          Similarity.cosineFrom(col("iv16"), col("qiv16"), col("nrm16"),
            col("qnrm16")).as("cosine16"))
          .orderBy(col("cosine16").desc, col("vec_id")).limit(topK)
          .withColumn("trunc_rank", row_number().over(
            Window.orderBy(col("cosine16").desc, col("vec_id")))
            .cast("bigint"))
        val full = body.select(col("vec_id"),
          Similarity.cosineFrom(col("iv"), col("qiv"), col("nrm"),
            col("qnrm")).as("cosf"))
          .orderBy(col("cosf").desc, col("vec_id")).limit(topK)
          .select(col("vec_id"), lit(true).as("in_full_topk"))
        trunc.join(full, Seq("vec_id"), "left")
          .select(col("trunc_rank"), col("vec_id"), col("label"),
            col("cosine16"),
            coalesce(col("in_full_topk"), lit(false)).as("in_full_topk"))
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |n AS (SELECT vec_id, label, iv, iv[1:$prefixDims] AS iv16,
           |  CAST(list_aggregate(list_transform(iv, x -> x * x),
           |    'sum') AS DOUBLE) AS nrm,
           |  CAST(list_aggregate(list_transform(iv[1:$prefixDims],
           |    x -> x * x), 'sum') AS DOUBLE) AS nrm16
           |  FROM iv),
           |q AS (SELECT iv AS qiv, iv16 AS qiv16, nrm AS qnrm,
           |        nrm16 AS qnrm16 FROM n WHERE vec_id = $queryVecId),
           |trunc AS (
           |  SELECT vec_id, label,
           |    CAST(list_aggregate(list_transform(generate_series(1, $prefixDims),
           |      i -> iv16[i] * qiv16[i]), 'sum') AS DOUBLE)
           |      / sqrt(nrm16 * qnrm16) AS cosine16
           |  FROM n, q WHERE vec_id <> $queryVecId
           |  ORDER BY cosine16 DESC, vec_id LIMIT $topK),
           |tr AS (SELECT *, CAST(row_number() OVER (
           |         ORDER BY cosine16 DESC, vec_id) AS BIGINT) AS trunc_rank
           |       FROM trunc),
           |full_k AS (
           |  SELECT vec_id, TRUE AS in_full_topk
           |  FROM (SELECT vec_id,
           |          CAST(list_aggregate(list_transform(generate_series(1, 64),
           |            i -> iv[i] * qiv[i]), 'sum') AS DOUBLE)
           |            / sqrt(nrm * qnrm) AS cosf
           |        FROM n, q WHERE vec_id <> $queryVecId
           |        ORDER BY cosf DESC, vec_id LIMIT $topK))
           |SELECT trunc_rank, vec_id, label, cosine16,
           |  coalesce(in_full_topk, FALSE) AS in_full_topk
           |FROM tr LEFT JOIN full_k USING (vec_id)""".stripMargin))
  }

  /** q182 — BATCH LATE-INTERACTION RETRIEVAL: q167's ColBERT MaxSim
    * served for a query SET in one dataflow (the production serving
    * shape — q167 answers one query per plan; a retrieval tier answers
    * a batch). The whole query bag (|Q| docs × 5 token vectors)
    * broadcasts; ONE corpus scan computes every (doc token × query
    * token) cosine map-side; both aggregations stay partial-agg
    * combinable keyed by (query, doc[, qt]); per-query top-k is a
    * row_number window partitioned by query — rank-bounded, never
    * corpus × |Q| rows past the first aggregation. Scores are the same
    * micro-quantized exact integers as q167, so the shared query doc's
    * ranking is bit-identical to q167's single-query answer
    * (TrainingPrepSpec pins it). */
  val q182 = {
    val tokensPerDoc = 5L
    val queryDocs = Seq(0L, 1L, 2L)
    val inList = queryDocs.mkString(", ")
    Q("q182_late_interaction_batch",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = intVecs(s, d)
          .select(col("vec_id"),
            expr(s"vec_id div $tokensPerDoc").as("doc_id"), col("iv"))
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
        val q = toks.filter(col("doc_id").isin(queryDocs: _*))
          .select(col("doc_id").as("query_id"), col("vec_id").as("qt"),
            col("iv").as("qiv"), col("nrm").as("qnrm"))
        toks
          .crossJoin(broadcast(q))
          // each query excludes only ITSELF from its candidates, so the
          // shared query doc's answer is exactly q167's single-query one
          .filter(col("doc_id") =!= col("query_id"))
          .select(col("query_id"), col("doc_id"), col("qt"),
            Similarity.cosineFrom(col("iv"), col("qiv"),
              col("nrm"), col("qnrm")).as("cosine"))
          // max per (query, doc, QUERY token) — each query token finds
          // its best match inside the document, exactly q167's MaxSim
          .groupBy(col("query_id"), col("doc_id"), col("qt"))
          .agg(max(col("cosine")).as("best"))
          .select(col("query_id"), col("doc_id"),
            round(col("best") * 1e12).cast("bigint").as("best_micro"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("best_micro")).as("maxsim"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("maxsim").desc, col("doc_id"))).cast("bigint"))
          .filter(col("rank") <= topK)
          .select(col("query_id"), col("rank"), col("doc_id"), col("maxsim"))
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |t AS (SELECT vec_id, vec_id // $tokensPerDoc AS doc_id, iv,
           |        CAST(list_aggregate(list_transform(iv, x -> x * x),
           |          'sum') AS DOUBLE) AS nrm
           |      FROM iv),
           |q AS (SELECT doc_id AS query_id, vec_id AS qt, iv AS qiv,
           |        nrm AS qnrm
           |      FROM t WHERE doc_id IN ($inList)),
           |best AS (SELECT query_id, t.doc_id, qt,
           |    max(CAST(list_aggregate(list_transform(generate_series(1, 64),
           |      i -> iv[i] * qiv[i]), 'sum') AS DOUBLE)
           |      / sqrt(nrm * qnrm)) AS best
           |  FROM t, q WHERE t.doc_id <> query_id GROUP BY 1, 2, 3),
           |scored AS (
           |  SELECT query_id, doc_id,
           |    CAST(sum(CAST(round(best * 1e12) AS BIGINT)) AS BIGINT)
           |      AS maxsim
           |  FROM best GROUP BY 1, 2)
           |SELECT query_id,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY maxsim DESC, doc_id) AS BIGINT) AS rank,
           |  doc_id, maxsim
           |FROM scored
           |QUALIFY rank <= $topK""".stripMargin))
  }

  /** q186 — RAG INDEXING PIPELINE end-to-end: the retrieval analog of
    * q157's training composite. One dataflow chunks every document
    * (16-token windows, array-local), embeds each chunk through the
    * BATCHED MODEL-INFERENCE STAGE ([[graft.ops.ModelInference]]) —
    * the physical shape of a production embed step: chunk texts are
    * assembled scan-side, gathered into fixed-size batches inside the
    * partition, and the embedder is invoked once per batch (the
    * GPU-shaped entry point; `spark.graft.inference.batchSize` is the
    * device-memory dial). The shipped embedder is the deterministic
    * hashed bag-of-tokens projection (dim j = Σ_tok (hash60(tok:j)
    * mod 2001 − 1000) — integer-exact, so the whole pipeline replays
    * bit-for-bit in the oracle; ModelInferenceSpec pins batch shape +
    * value parity with the declarative SQL-sums formulation); a real
    * deployment swaps the `embedBatch` body and nothing else. The
    * index then buckets chunks by 4-bit embedding sign (the LSH cell)
    * and serves a query chunk from its bucket with an exact
    * integer-cosine rerank.
    *
    * Scale shape: chunking + embedding are scan-local (one corpus
    * pass, ZERO shuffles before the index — the inference stage is a
    * per-partition batch loop, cheaper than the former explode +
    * 16-way groupBy); the index relation is chunks-sized, keyed by
    * bucket; the query probes ONE bucket (~1/16 of chunks) and reranks
    * only that — never corpus². */
  val q186 = {
    val chunkTok = 16L
    val dims = 16
    val signBits = 4
    val ragK = 5
    Q("q186_rag_pipeline",
      (s, d) => {
        import graft.ops.{ModelInference, TextAnalysis}
        import org.apache.spark.sql.expressions.Window
        val chunks = Catalog.documentsSpread(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(0L),
              expr(s"(size(t) - 1) div $chunkTok"))).as("ci"))
          // chunk text re-assembled for the model boundary: tokens are
          // \s+-split (never contain a space), so the " "-join
          // round-trips the token list exactly, empties included
          .select(col("doc_id"), col("ci"),
            array_join(slice(col("t"), (col("ci") * chunkTok + 1).cast("int"),
              lit(chunkTok.toInt)), " ").as("chunk_text"))
        val batch = s.conf.get(ModelInference.batchSizeKey,
          ModelInference.defaultBatchSize.toString).toInt
        val emb = ModelInference.embed(chunks, "chunk_text",
            new ModelInference.HashedBowEmbedder(dims), batch)
          .select(col("doc_id"), col("ci"), col("emb").as("iv"),
            (1 to signBits).map(j =>
              when(col("emb")(j - 1) > 0, 1L << (j - 1)).otherwise(0L))
              .reduce(_ + _).as("bucket"))
          .withColumn("nrm", Similarity.norm2(col("iv")).cast("double"))
          // the built index: chunks-sized, read twice (query row lookup
          // + serve scan) — without the persist each reference re-runs
          // the whole chunk+embed pass over the corpus
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = emb.filter(col("doc_id") === 0 && col("ci") === 0)
          .select(col("iv").as("qiv"), col("bucket").as("qb"),
            col("nrm").as("qnrm"))
        emb.join(broadcast(q), col("bucket") === col("qb"))
          .filter(!(col("doc_id") === 0 && col("ci") === 0))
          .select(col("doc_id"), col("ci"),
            Similarity.cosineFrom(col("iv"), col("qiv"), col("nrm"),
              col("qnrm")).as("cosine"))
          .orderBy(col("cosine").desc, col("doc_id"), col("ci"))
          .limit(ragK)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cosine").desc, col("doc_id"), col("ci")))
            .cast("bigint"))
          .select(col("rank"), col("doc_id"),
            col("ci").cast("bigint").as("chunk_idx"), col("cosine"))
      },
      Some {
        def h(j: Int) = TextQueries.hash60Sql(s"tok || ':$j'")
        val sumCols = (1 to dims)
          .map(j => s"sum(${h(j)} % 2001 - 1000) AS e$j").mkString(",\n  ")
        val nrm = (1 to dims).map(j => s"e$j * e$j").mkString(" + ")
        val dot = (1 to dims).map(j => s"e$j * qe$j").mkString(" + ")
        val qCols = (1 to dims).map(j => s"e$j AS qe$j").mkString(", ")
        val bucket = (1 to signBits)
          .map(j => s"(CASE WHEN e$j > 0 THEN ${1L << (j - 1)} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
           |  FROM documents),
           |ch AS (
           |  SELECT doc_id, i AS ci,
           |    t[i * $chunkTok + 1 : least((i + 1) * $chunkTok, n)] AS ct
           |  FROM (SELECT doc_id, t, n,
           |          unnest(generate_series(0, (n - 1) // $chunkTok)) AS i
           |        FROM d)),
           |tok AS (SELECT doc_id, ci, u.tok FROM ch, unnest(ch.ct) u(tok)),
           |emb AS (SELECT doc_id, ci,
           |  $sumCols
           |  FROM tok GROUP BY 1, 2),
           |n2 AS (SELECT *, $nrm AS nrm, $bucket AS bucket FROM emb),
           |q AS (SELECT $qCols, nrm AS qnrm, bucket AS qb
           |      FROM n2 WHERE doc_id = 0 AND ci = 0),
           |hits AS (
           |  SELECT doc_id, ci,
           |    CAST($dot AS DOUBLE) / sqrt(CAST(nrm AS DOUBLE)
           |      * CAST(qnrm AS DOUBLE)) AS cosine
           |  FROM n2, q
           |  WHERE bucket = qb AND NOT (doc_id = 0 AND ci = 0)
           |  ORDER BY cosine DESC, doc_id, ci LIMIT $ragK)
           |SELECT CAST(row_number() OVER (
           |    ORDER BY cosine DESC, doc_id, ci) AS BIGINT) AS rank,
           |  doc_id, CAST(ci AS BIGINT) AS chunk_idx, cosine
           |FROM hits""".stripMargin
      })
  }

  /** q192 — PCA TOP COMPONENT BY POWER ITERATION (embedding whitening /
    * compression prep — the OPQ/PCA rotation step before quantized ANN):
    * mean-center the corpus, then 4 power-iteration rounds of v ←
    * normalize(Σ_rows xᶜ·(xᶜ·v)) — the leading eigenvector of the
    * (unnormalized) covariance — entirely in fixed-point: vectors and v
    * are micro-quantized ints, every per-row dot product is an exact
    * integer, each round's per-dimension matvec contribution is
    * micro-rounded BEFORE the sum (exact integer aggregation, no FP
    * order), and the only floating math is fixed-shape scalar
    * normalization (max-abs rescale then 1/√ss) both engines compute
    * identically. Degenerate (all-zero-variance) corpora are guarded by
    * greatest(·,1) clamps on both divisors.
    *
    * Scale shape: K+2 corpus passes, each ONE map-side-combinable
    * aggregate of 64 columns (no explode, no shuffle of row-sized data);
    * driver state is the 64-entry v (the KMeans-codebook precedent).
    * Per-dim sums are int64 here; a 10¹²-row corpus wants decimal(38)
    * accumulators — same plan shape. The oracle replays the identical
    * arithmetic as K unrolled CTE rounds over the exploded layout.
    */
  val q192 = {
    val iters = 4
    val dims = 64
    Q("q192_pca_power_iteration",
      (s, d) => {
        import s.implicits._
        def halfUp(x: Double): Long = new java.math.BigDecimal(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        val xm = Catalog.embeddings(s, d).select(
          expr("transform(embedding, e -> cast(round(cast(e AS DOUBLE)" +
            " * 1000000) AS BIGINT))").as("xm"))
          // one cache partition per core: the corpus ships as a single
          // parquet split at this sf, which would pin every power-pass
          // aggregate to ONE task (StageProbe r11); explicit N is
          // exempt from AQE cache-plan coalescing, and at cluster
          // scale defaultParallelism is the right width too
          .repartition(s.sparkContext.defaultParallelism)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ONE stats pass: row count and the 64 per-dim sums share a
        // single map-side-combinable aggregate (was count + sums — two
        // corpus reads); the centered relation is NEVER materialized —
        // each power round subtracts mu inline from the persisted raw
        // vectors (identical integers, zip_with is cheap next to the
        // pass's I/O), saving the cx build+cache pass and its storage.
        val sums = xm.agg(count(lit(1)).as("n"),
          (0 until dims).map(i => sum(col("xm")(i)).as(s"s$i")): _*).head()
        val nRows = sums.getLong(0)
        val mu = Array.tabulate(dims)(i =>
          halfUp(sums.getLong(i + 1).toDouble / nRows))
        val muLit = array(mu.map(lit): _*)
        val cx = xm.select(zip_with(col("xm"), muLit,
          (a, b) => a - b).as("xc"))
        var v = Array.fill(dims)(125000L) // 1e6/√64 — unit-norm uniform
        for (_ <- 1 to iters) {
          val vLit = array(v.map(lit): _*)
          // the row's dot product is PROJECTED once and the 64 matvec
          // sums aggregate over that column — inlining dotS into every
          // sum would repeat its ~200-node expression subtree 64×,
          // which costs more in per-round analysis/optimization than
          // the round's actual data pass at this width (same doubles
          // either way: one deterministic expression, evaluated once)
          val dotted = cx.withColumn("dot",
            aggregate(zip_with(col("xc"), vLit, (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).cast("double") / lit(1e12))
          val y = dotted.agg(
            sum(round(col("xc")(0) * col("dot")).cast("bigint")).as("y0"),
            (1 until dims).map(i =>
              sum(round(col("xc")(i) * col("dot")).cast("bigint"))
                .as(s"y$i")): _*)
            .head()
          val ys = Array.tabulate(dims)(y.getLong)
          val ma = math.max(ys.map(math.abs).max.toDouble, 1.0)
          val u = ys.map(yv => halfUp(yv.toDouble / ma * 1e6))
          val ss = u.map(uv => uv * uv).sum
          val den = math.max(math.sqrt(ss.toDouble), 1.0)
          v = u.map(uv => halfUp(uv.toDouble * 1e6 / den))
        }
        xm.unpersist()
        (0 until dims).map(i => (i.toLong, mu(i), v(i)))
          .toDF("d", "mu_micro", "v_micro")
      },
      Some {
        // MATERIALIZED everywhere a relation is referenced twice:
        // DuckDB inlines plain CTEs, so each unrolled round would
        // otherwise re-expand the whole upstream tree (measured 61 s
        // for 4 rounds at sf0.1 → ~1 s materialized).
        val rounds = (1 to iters).map { t =>
          s"""dot$t AS MATERIALIZED (SELECT vec_id, sum(xc * v) AS dot
             |  FROM cx JOIN v${t - 1} USING (d) GROUP BY vec_id),
             |y$t AS MATERIALIZED (SELECT d, sum(CAST(round(CAST(xc AS DOUBLE)
             |    * (CAST(dot AS DOUBLE) / 1e12)) AS BIGINT)) AS y
             |  FROM cx JOIN dot$t USING (vec_id) GROUP BY d),
             |ma$t AS (SELECT greatest(CAST(max(abs(y)) AS DOUBLE), 1.0)
             |    AS ma FROM y$t),
             |u$t AS MATERIALIZED (SELECT d,
             |    CAST(round(CAST(y AS DOUBLE) / ma * 1000000)
             |    AS BIGINT) AS u FROM y$t, ma$t),
             |ss$t AS (SELECT greatest(sqrt(CAST(sum(u * u) AS DOUBLE)), 1.0)
             |    AS den FROM u$t),
             |v$t AS MATERIALIZED (SELECT d,
             |    CAST(round(CAST(u AS DOUBLE) * 1000000 / den)
             |    AS BIGINT) AS v FROM u$t, ss$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH ex AS MATERIALIZED (
           |  SELECT vec_id, i - 1 AS d,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
           |      AS BIGINT) AS x
           |  FROM (SELECT vec_id, embedding,
           |          unnest(generate_series(1, len(embedding))) AS i
           |        FROM embeddings)),
           |nr AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM embeddings),
           |mu AS MATERIALIZED (SELECT d, CAST(round(CAST(sum(x) AS DOUBLE) / nn)
           |    AS BIGINT) AS mu FROM ex, nr GROUP BY d, nn),
           |cx AS MATERIALIZED (SELECT vec_id, d, x - mu AS xc
           |  FROM ex JOIN mu USING (d)),
           |v0 AS (SELECT DISTINCT d, CAST(125000 AS BIGINT) AS v FROM ex),
           |$rounds
           |SELECT d, mu AS mu_micro, v AS v_micro
           |FROM v$iters JOIN mu USING (d)""".stripMargin
      })
  }

  /** q211 — STORED-GRAPH CONTENT AUDIT (correctness-only,
    * [[Q.benchExcluded]] like q171): every stored graph the timed
    * oracles now read as a fixed-path mirror — the full graph
    * ([[knnRefFixturePath]]), the history base
    * ([[knnRefhFixturePath]]), all three layers of the layered
    * index, and the dup-injected q168 graph
    * ([[knnDup168FixturePath]], r18) — dumped as (g, u, v) edge rows
    * and hash-compared against the FULL construction replay in
    * DuckDB. This is the q162 anchor role for the graph family: if
    * any store (or the layered layer 0 vs the flat build) drifted
    * from the chain the oracle replays, this query goes red, so the
    * probe-only consumer oracles (q165/q166/q168/q170/q175) stay
    * trustworthy. */
  val q211 = Q("q211_stored_graph_audit",
    (s, d) => {
      val isDelta = (col("vec_id") % graphDeltaMod) >= graphDeltaFrom
      val layered = storedLayeredEdges(s, d)
      def tag(df: DataFrame, g: String): DataFrame =
        df.select(lit(g).as("g"), col("u"), col("v"))
      // every layer 0..layerLevels audited, DERIVED from layerLevels —
      // raising it must grow the audit on both sides in lockstep, not
      // leave upper layers silently uncovered (ADVICE r11)
      ((0 to layerLevels).map(l =>
        tag(layered.filter(col("layer") === l), s"l$l")) :+
        tag(storedDup168Graph(s, d), "dup168"))
        .foldLeft(
          tag(storedBuiltGraph(s, d, "full", None), "full")
            .unionByName(tag(
              storedBuiltGraph(s, d, "base", Some(!isDelta)), "base")))(
          _ unionByName _)
    },
    Some {
      // per-layer CTEs generated from layerLevels (layer ℓ samples
      // vec_id % layerMod^ℓ = 0; layer 0 is the full graph) — the same
      // derivation q175's engine side uses, mirrored here
      def mod(l: Int): Long =
        math.pow(layerMod.toDouble, l.toDouble).toLong
      val layerCtes = (1 to layerLevels).map(l =>
        s"""nx$l AS MATERIALIZED (SELECT * FROM n
           |      WHERE vec_id % ${mod(l)} = 0),
           |${graphChainSql(s"nx$l", s"x$l")}""".stripMargin)
        .mkString(",\n")
      val layerSelects = (0 to layerLevels).map(l =>
        s"UNION ALL SELECT 'l$l' AS g, u, v FROM ref" +
          (if (l == 0) "" else s"x$l")).mkString("\n")
      s"""WITH $graphCorpusSql,
         |${graphChainSql("n", "")},
         |nh AS MATERIALIZED (SELECT * FROM n
         |      WHERE vec_id % $graphDeltaMod < $graphDeltaFrom),
         |${graphChainSql("nh", "h")},
         |$layerCtes,
         |${dup168CorpusCtes("ed", "ivd", "nd")},
         |${graphChainSql("nd", "d")}
         |SELECT 'full' AS g, u, v FROM ref
         |UNION ALL SELECT 'base' AS g, u, v FROM refh
         |$layerSelects
         |UNION ALL SELECT 'dup168' AS g, u, v FROM refd""".stripMargin
    })

  /** q221 — kNN-graph construction on the TRAINED-QUANTIZER init (the
    * past-the-clamp key [[graft.ops.KnnGraph.initKind]] switches to at
    * ~17M vectors, exercised here at a forced fixed width so the whole
    * path is hash-verified at test scale): two independently-seeded
    * k-means codebooks ([[graft.ops.KMeans.trainCodebook]], rank-based
    * disjoint seed slices, one Lloyd update) assign every vector a
    * cell id per table ([[graft.ops.KMeans.assignBroadcast]] — the
    * broadcast-relation form whose min(struct) partial aggregation
    * keeps the assignment shuffle at N rows at ANY codebook size),
    * then the standard NN-Descent build runs on the COMPOSITE keys —
    * cell id · 2^subBits + that table's disjoint sign-bit slice, the
    * form the policy ships past the clamp (the signs carry 2^subBits
    * of the split for free, so the trained codebook stays tiny and
    * its n·cells·dim assignment stays scan-cheap at any N).
    * Hash-green means seeding, both Lloyd passes, the broadcast
    * argmin tie-breaks, the composite multi-table init AND the
    * refinement rounds are bit-identical to the oracle end to end —
    * the same guarantee q164 gives the sign-bucket init.
    *
    * Scale shape (100 TB): training passes are O(N·cells·dim)
    * map-side arithmetic + one N-row shuffle each (cells ≈ n/2^24
    * under the policy — 2 at the 17M clamp boundary, ~60 at 10^9;
    * train on a `vec_id % mod` sample past 10^7 vectors); the init
    * self-join is bounded by composite occupancy ≈ targetBlock by
    * construction — the linear init term sign buckets cannot provide
    * past 2^16 buckets. */
  val q221 = {
    val cells = 8
    val subBits = 3
    // oracle side of one rank-seeded trainCodebook(k=8, iters=2) +
    // full-corpus assignBroadcast: seeds = vec_id-ranks
    // [t·8+1, (t+1)·8] (cid 0..7), one round-mean update, final
    // nearest-centroid assignment with (d2, cid) tie-break
    def kmeansSql(t: Int): String = {
      val lo = t * cells + 1
      val hi = (t + 1) * cells
      s"""sd$t AS (SELECT rk.r - $lo AS cid, d.p, d.x AS c
         |       FROM rk JOIN dims d USING (vec_id)
         |       WHERE rk.r BETWEEN $lo AND $hi),
         |dist1_$t AS (SELECT d.vec_id, s.cid,
         |         sum((d.x - s.c) * (d.x - s.c)) AS d2
         |       FROM dims d JOIN sd$t s USING (p) GROUP BY 1, 2),
         |a1_$t AS (SELECT vec_id, cid FROM (
         |       SELECT vec_id, cid, row_number() OVER (
         |         PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |       FROM dist1_$t) WHERE rn = 1),
         |c1_$t AS (SELECT a.cid, d.p,
         |         CAST(round(CAST(sum(d.x) AS DOUBLE) / count(*)) AS BIGINT)
         |           AS c
         |       FROM dims d JOIN a1_$t a USING (vec_id) GROUP BY 1, 2),
         |dist2_$t AS (SELECT d.vec_id, c.cid,
         |         sum((d.x - c.c) * (d.x - c.c)) AS d2
         |       FROM dims d JOIN c1_$t c USING (p) GROUP BY 1, 2),
         |asg$t AS (SELECT vec_id, cid FROM (
         |       SELECT vec_id, cid, row_number() OVER (
         |         PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |       FROM dist2_$t) WHERE rn = 1)""".stripMargin
    }
    Q("q221_graph_quantizer_init",
      (s, d) => {
        val base = Catalog.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            Similarity.intVec(col("embedding")).as("iv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bucketed = graft.ops.KnnGraph
          .withInitBuckets(base,
            graft.ops.KnnGraph.InitKind.QuantizerCells(cells, subBits),
            nTrainHint = Some(corpusN(s, d)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.ops.KnnGraph.build(bucketed, graphK, rounds = graphRounds,
          bucketCols = Seq("sb1", "sb2"), nHint = Some(corpusN(s, d)))
          .select(col("u"), col("v"))
      },
      Some(
        s"""WITH iv AS ($intVecsSql),
           |pos AS (SELECT unnest(generate_series(1, 64)) AS p),
           |dims AS (SELECT vec_id, p, iv[p] AS x FROM iv, pos),
           |rk AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS r
           |       FROM iv),
           |${kmeansSql(0)},
           |${kmeansSql(1)},
           |n AS MATERIALIZED (SELECT v.vec_id, v.iv,
           |       CAST(list_aggregate(list_transform(v.iv, x -> x * x),
           |         'sum') AS DOUBLE) AS nrm,
           |       a0.cid * ${1 << subBits} + list_aggregate(
           |         list_transform(generate_series(1, $subBits),
           |           i -> CASE WHEN v.iv[i] > 0
           |                THEN CAST(1 AS BIGINT) << (i - 1)
           |                ELSE CAST(0 AS BIGINT) END), 'sum') AS sb1,
           |       b1.cid * ${1 << subBits} + list_aggregate(
           |         list_transform(
           |           generate_series($subBits + 1, $subBits + $subBits),
           |           i -> CASE WHEN v.iv[i] > 0
           |                THEN CAST(1 AS BIGINT) << (i - $subBits - 1)
           |                ELSE CAST(0 AS BIGINT) END), 'sum') AS sb2
           |     FROM iv v JOIN asg0 a0 USING (vec_id)
           |       JOIN asg1 b1 USING (vec_id)),
           |${graphChainSql("n", "")}
           |SELECT u, v FROM ref""".stripMargin))
  }

  val all: Seq[Q] =
    Seq(q23, q24, q36, q56, q58, q60, q68, q84, q102, q138, q150, q153,
      q164, q165, q166, q167, q168, q169, q170, q171, q174, q175, q177,
      q179, q181, q182, q186, q192, q206, q211, q221)
}
