package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

class StreamingDedupSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  // documents plus near-dup injections (the q19 corpus shape), streamed
  // in doc_id order: originals first, shifted near-copies in batch 2
  private lazy val corpus: Seq[Doc] = {
    val docs = graft.tables.Catalog.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(60)
      .as[(Long, String)].collect().toSeq
    val dups = docs.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + 1000000L, t + " graft near dup tail") }
    (docs ++ dups).sortBy(_._1).map((Doc.apply _).tupled)
  }

  test("streaming LSH flags exactly the docs the batch pipeline pairs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.streamingCandidates(spark, input.toDS(), 3)
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      val (b1, b2) = corpus.splitAt(corpus.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sdedup")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    val batchPairs = Dedup.minhashCandidates(
        corpus.toDF("doc_id", "text"), 3)
      .as[(Long, Long)].collect().toSet

    // every streamed candidate is a true batch candidate (they share a
    // band bucket by construction)
    assert(streamed.subsetOf(batchPairs),
      s"streamed-only pairs: ${streamed -- batchPairs}")
    // and every doc the batch pipeline pairs with an EARLIER doc gets
    // flagged online (possibly against a different same-bucket partner)
    assert(streamed.map(_._2) == batchPairs.map(_._2),
      s"missed: ${batchPairs.map(_._2) -- streamed.map(_._2)}")
    // the injected near-dups must all be caught
    val injected = corpus.map(_.doc_id).filter(_ >= 1000000L).toSet
    assert(injected.subsetOf(streamed.map(_._2)))
  }

  test("transformWithState variant emits identical candidates (RocksDB store)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the new API requires the RocksDB provider; scope it to this query
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Doc]
      val q = StreamingDedup.streamingCandidatesTws(spark, input.toDS(), 3)
        .writeStream.format("memory").queryName("sdedup_tws")
        .outputMode("append").start()
      try {
        val (b1, b2) = corpus.splitAt(corpus.size / 2)
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()
      val tws = spark.table("sdedup_tws")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // exact parity with the flatMapGroupsWithState pipeline: same
      // buckets, same canonical rule, same batch split → same pairs
      val input2 = MemoryStream[Doc]
      val q2 = StreamingDedup.streamingCandidates(spark, input2.toDS(), 3)
        .writeStream.format("memory").queryName("sdedup_fmg")
        .outputMode("append").start()
      try {
        val (b1, b2) = corpus.splitAt(corpus.size / 2)
        input2.addData(b1); q2.processAllAvailable()
        input2.addData(b2); q2.processAllAvailable()
      } finally q2.stop()
      val fmg = spark.table("sdedup_fmg")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(tws == fmg, s"tws-only: ${tws -- fmg}; fmg-only: ${fmg -- tws}")
      assert(tws.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed band hits are bit-identical to the batch derivation") {
    val df = corpus.toDF("doc_id", "text")
    val arraySide = StreamingDedup.bandHits(df, 3)
      .as[(Long, Long)].collect().toSet
    val batchSide = Dedup.lshBands(
        Dedup.minhashSignature(Dedup.hashedShingles(df, 3)))
      .select(col("doc_id"), col("bh")).as[(Long, Long)].collect().toSet
    assert(arraySide == batchSide)
  }
}
