package graft.queries

import graft.ops.Multimodal
import graft.tables.Catalog

/** Multimodal plumbing as a verifiable query: the binary payload ride,
  * batched mapPartitions decode (stubbed — see [[graft.ops.Multimodal]]),
  * and typed feature output. The oracle recomputes the stub's
  * deterministic fakes in SQL over the same text bytes.
  */
object MultimodalQueries {

  val q25 = Q("q25_multimodal_features",
    (s, d) => Multimodal.decodeFeatures(s,
      Multimodal.mediaFromDocuments(Catalog.documents(s, d))).toDF(),
    Some(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(strlen(text) % 640 AS BIGINT) AS width,
        |  CAST(strlen(text) % 480 AS BIGINT) AS height,
        |  concat_ws(' ', toks[1], toks[11], toks[21], toks[31]) AS frame_sample
        |FROM (SELECT *, regexp_split_to_array(text, '\s+') AS toks
        |      FROM documents)""".stripMargin))

  /** q133 — the RESIZE stage as a verifiable query: payloads ride the
    * typed batched-mapPartitions contract through a byte-budget resize
    * (stub: stride sampling — a real codec swaps the batch body, see
    * [[graft.ops.Multimodal.stubResize]]). The stub's OUTPUT SIZE is a
    * pure function of the input size (ceil(len/stride), stride =
    * len div budget), so the oracle verifies the size bookkeeping of
    * the whole typed stage arithmetically — proving metadata stays
    * consistent with the payload through a mutating media stage. */
  val q133 = Q("q133_multimodal_resize",
    (s, d) => {
      import org.apache.spark.sql.functions.col
      Multimodal.resize(s,
          Multimodal.mediaFromDocuments(Catalog.documents(s, d)), 256)
        .toDF().select(col("media_id"), col("kind"), col("n_bytes"))
    },
    Some(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(CASE WHEN len <= 256 THEN len
        |            ELSE (len - 1) // (len // 256) + 1 END AS BIGINT)
        |    AS n_bytes
        |FROM (SELECT doc_id, strlen(text) AS len FROM documents)""".stripMargin))

  val all: Seq[Q] = Seq(q25, q133)
}
