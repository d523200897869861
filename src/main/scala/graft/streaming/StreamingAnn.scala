package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.{AnnIndex, Similarity}

/** STREAMING maintenance of the persistent ANN index — the similarity
  * sibling of [[StreamingDedup]]: an unbounded stream of new embedding
  * rows keeps the stored IVF index current without ever retraining in
  * the hot path. Each micro-batch is assigned to the STORED centroids
  * (the zero-shuffle literal projection of [[AnnIndex.appendDelta]])
  * and appended to the assignment relation; probes against the index
  * see every vector the moment its batch commits.
  *
  * Drift handling stays an EXPLICIT maintenance action
  * ([[AnnIndex.maintain]]) run between streams or on a schedule —
  * never inside the micro-batch, where a rebuild would stall the
  * stream and tear the index under concurrent probes.
  *
  * State shape: the stream itself is STATELESS (no watermark, no
  * aggregation — assignment is per-row); the only cross-batch state is
  * the source-tracking checkpoint, so a restart resumes exactly where
  * the last commit left off and no batch is ever double-appended.
  */
object StreamingAnn {

  /** embeddings.parquet physical schema (for the streaming read). */
  val embeddingsRawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Process every available embedding file under `srcDir` into the
    * index at `idxPath` (Trigger.AvailableNow), then return. The index
    * must already exist ([[AnnIndex.build]] over the history corpus). */
  def maintain(spark: SparkSession, srcDir: String, idxPath: String): Unit = {
    val stream = spark.readStream.schema(embeddingsRawSchema)
      .parquet(srcDir)
      .select(col("vec_id"), Similarity.intVec(col("embedding")).as("iv"))
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${idxPath}__ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.appendDelta(spark, idxPath, batch); ()
      }
      .start()
    q.awaitTermination()
  }
}
