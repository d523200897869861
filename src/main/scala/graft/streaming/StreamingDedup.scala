package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Dedup, TextAnalysis}

/** STREAMING near-duplicate detection: MinHash LSH over an unbounded
  * document stream with BOUNDED state — the online analog of the batch
  * [[graft.ops.Dedup.minhashCandidates]] pipeline (same shingles, same
  * (a·h+c) mod P signatures, same band hashing, bit-identical).
  *
  * Shape: the signature + band derivation is fully ARRAY-SIDE (one
  * projection per row — shingle array → per-function array_min → band
  * hashes; no per-doc aggregation state), so the ONLY stateful operator
  * is a per-band-bucket `flatMapGroupsWithState` holding one Long (the
  * bucket's canonical = minimum doc_id seen so far). State is
  * O(distinct band buckets) — corpus-proportional but tiny per entry,
  * the same footprint a batch LSH index would persist — and every
  * arriving doc that lands in a non-empty bucket emits
  * (canonical, doc_id) immediately: streaming dedup decisions without
  * ever re-scanning history.
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)
  case class BandHit(bh: Long, doc_id: Long)
  case class Candidate(doc_a: Long, doc_b: Long)

  /** (bh, doc_id) band hits computed entirely array-side — mirrors
    * Dedup.{hashedShingles → minhashSignature → lshBands} with the
    * per-doc aggregation replaced by array_min over the in-row shingle
    * array (minhash is multiset-invariant, so no distinct needed). */
  def bandHits(docs: DataFrame, n: Int): DataFrame = {
    val tokenized = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val idx = when(size(col("toks")) >= n,
      sequence(lit(1), size(col("toks")) - (n - 1))).otherwise(array())
    val shingled = tokenized.select(col("doc_id"),
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*))
        .as("shingles"))
    // hash once per shingle, then each signature row is an array_min
    val hashed = shingled.select(col("doc_id"),
      transform(col("shingles"),
        s => TextAnalysis.hash60Composable(s) % Dedup.P).as("hs"))
    val sigs = hashed.select(col("doc_id") +:
      Dedup.minhashParams.zipWithIndex.map { case ((a, c), k) =>
        array_min(transform(col("hs"), h => (h * a + c) % Dedup.P))
          .as(s"mh$k")
      }: _*)
    sigs.select(col("doc_id"), explode(array(
      (0 until Dedup.bandsOf).map { j =>
        TextAnalysis.hash60(concat(
          lit(j.toString), lit("_"),
          col(s"mh${2 * j}").cast("string"), lit("_"),
          col(s"mh${2 * j + 1}").cast("string")))
      }: _*)).as("bh"))
      .filter(col("bh").isNotNull) // docs shorter than n shingle to nothing
  }

  /** The per-bucket canonical logic as a Spark 4 [[StatefulProcessor]]
    * (the `transformWithState` API — typed named state handles on the
    * RocksDB store, the successor to flatMapGroupsWithState): one
    * ValueState[Long] per band bucket holding the canonical (minimum)
    * doc_id, identical emission semantics to [[streamingCandidates]].
    * TTLConfig.NONE because bucket canonicals must outlive any window
    * (they ARE the index); a production variant with churn would TTL
    * them to the dedup horizon. */
  private class CanonicalBucketProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BandHit, Candidate] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode,
      TimerValues, TTLConfig, ValueState}
    @transient private var canonical: ValueState[Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      canonical = getHandle.getValueState[Long]("canonical",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[BandHit],
        timerValues: TimerValues): Iterator[Candidate] = {
      var can = if (canonical.exists()) canonical.get() else Long.MaxValue
      val out = scala.collection.mutable.ListBuffer.empty[Candidate]
      rows.map(_.doc_id).toSeq.sorted.foreach { d =>
        if (can < d) out += Candidate(can, d)
        if (d < can) can = d
      }
      canonical.update(can)
      out.iterator
    }
  }

  /** [[streamingCandidates]] re-expressed on `transformWithState` —
    * same outputs (StreamingDedupSpec proves parity), but state lives
    * in named typed handles on the RocksDB provider, which is what
    * unlocks TTL, timers, and multiple state variables per key at
    * scale. Caller must have the RocksDB state store provider set
    * (`spark.sql.streaming.stateStore.providerClass`) — the API
    * requires it. */
  def streamingCandidatesTws(spark: SparkSession, docs: Dataset[Doc],
      shingleN: Int): Dataset[Candidate] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    bandHits(docs.toDF(), shingleN).as[BandHit]
      .groupByKey(_.bh)
      .transformWithState(new CanonicalBucketProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** The streaming pipeline: docs → band hits → per-bucket canonical
    * state → (canonical, newcomer) candidates. Emits each newcomer at
    * most once per band bucket; downstream exact-verify/dedup is the
    * same as in the batch pipeline. Within a micro-batch, rows are
    * processed in doc_id order (deterministic replay). */
  def streamingCandidates(spark: SparkSession, docs: Dataset[Doc],
      shingleN: Int): Dataset[Candidate] = {
    import spark.implicits._
    bandHits(docs.toDF(), shingleN).as[BandHit]
      .groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BandHit], state: GroupState[Long]) =>
          var canonical = state.getOption.getOrElse(Long.MaxValue)
          val out = scala.collection.mutable.ListBuffer.empty[Candidate]
          rows.map(_.doc_id).toSeq.sorted.foreach { d =>
            if (canonical < d) out += Candidate(canonical, d)
            if (d < canonical) canonical = d
          }
          state.update(canonical)
          out.iterator
      }
  }
}
