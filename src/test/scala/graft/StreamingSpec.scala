package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Sessionize
import graft.ops.Sessionize.Ev

class StreamingSessionizeSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private val M = 60L * 1000000 // one minute in micros

  // user 1: two sessions (gap 40min); user 2: one session
  private val batch1 = Seq(
    Ev(1, 1, 0 * M, 1.0), Ev(1, 2, 10 * M, 2.5), Ev(2, 3, 5 * M, 4.0))
  private val batch2 = Seq(
    Ev(1, 4, 50 * M, 3.0), Ev(1, 5, 55 * M, 1.25), Ev(2, 6, 20 * M, 0.5))
  private val sentinelTs = 10000 * M
  private val sentinels = Seq(Ev(1, 99, sentinelTs, -1), Ev(2, 98, sentinelTs, -1))

  test("flatMapGroupsWithState sessionizer matches the batch formulation") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    // timeoutMs = None: processAllAvailable-driven test (a pending
    // processing-time timeout would keep the no-data batch loop running
    // forever — see streamingSessions doc); sentinels flush instead.
    val q = Sessionize.streamingSessions(spark, input.toDS(), timeoutMs = None)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      input.addData(sentinels) // force-close every open session
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_out")
      .filter(col("session_start") < sentinelTs) // drop sentinel sessions
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_cents"))
      .collect().map(_.toString).sorted.toSeq

    val batchDf = (batch1 ++ batch2).toDF()
      .withColumn("ts", timestamp_micros(col("ts")))
    val batched = Sessionize.batch(batchDf)
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"), col("value_cents"))
      .collect().map(_.toString).sorted.toSeq

    assert(streamed == batched)
    assert(streamed.size == 3) // 2 sessions for user 1, 1 for user 2
  }

  test("processing-time timeout flushes a user's final session") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    // Short real timeout: after ~300ms with no input, hasTimedOut fires
    // and the open sessions are emitted without any sentinel event. The
    // registered timeout keeps the engine running no-data batches, which
    // is exactly what advances processing time past the deadline.
    val q = Sessionize.streamingSessions(spark, input.toDS(),
        timeoutMs = Some(300L))
      .writeStream.format("memory").queryName("sess_timeout_out")
      .outputMode("append").start()
    try {
      input.addData(batch1)
      val deadline = System.currentTimeMillis() + 30000
      def flushed(): Long = spark.table("sess_timeout_out").count()
      while (flushed() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val rows = spark.table("sess_timeout_out")
        .select(col("user_id"), col("n_events"), col("value_cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // user 1's open session (2 events, 350c) and user 2's (1 event,
      // 400c) both close by timeout, not by gap
      assert(rows == Set((1L, 2L, 350L), (2L, 1L, 400L)))
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the batch formulation " +
      "(RocksDB store)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val q = Sessionize.streamingSessionsTws(spark, input.toDS(),
          timeoutMs = None)
        .writeStream.format("memory").queryName("sess_tws_out")
        .outputMode("append").start()
      try {
        input.addData(batch1)
        q.processAllAvailable()
        input.addData(batch2)
        q.processAllAvailable()
        input.addData(sentinels)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("sess_tws_out")
        .filter(col("session_start") < sentinelTs)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("value_cents"))
        .collect().map(_.toString).sorted.toSeq
      val batchDf = (batch1 ++ batch2).toDF()
        .withColumn("ts", timestamp_micros(col("ts")))
      val batched = Sessionize.batch(batchDf)
        .select(col("user_id"), unix_micros(col("session_start")),
          unix_micros(col("session_end")), col("n_events"),
          col("value_cents"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batched)
      assert(streamed.size == 3)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState timer flushes a user's final session") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val q = Sessionize.streamingSessionsTws(spark, input.toDS(),
          timeoutMs = Some(300L))
        .writeStream.format("memory").queryName("sess_tws_timeout_out")
        .outputMode("append").start()
      try {
        input.addData(batch1)
        val deadline = System.currentTimeMillis() + 30000
        def flushed(): Long = spark.table("sess_tws_timeout_out").count()
        while (flushed() < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        val rows = spark.table("sess_tws_timeout_out")
          .select(col("user_id"), col("n_events"), col("value_cents"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        assert(rows == Set((1L, 2L, 350L), (2L, 1L, 400L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("windowed aggregation with watermark emits exactly the closed windows") {
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (ts_micros, value_cents)
    val agg = input.toDS().toDF("ts", "cents")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .select(col("w.start").as("wstart"), col("n"), col("cents"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      val H = 3600L * 1000000; val M = 60L * 1000000
      // hour 0 gets three events; hour 1 one event
      input.addData((5 * M, 10L), (20 * M, 20L), (50 * M, 30L))
      q.processAllAvailable()
      input.addData((H + 5 * M, 40L))
      q.processAllAvailable() // watermark → 0:55; hour-0 window still open
      assert(spark.table("win_out").count() == 0)
      // an event far ahead closes both earlier windows
      input.addData((3 * H, 1L))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(unix_micros(col("wstart")), col("n"), col("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((0L, 3L, 60L), (H, 1L, 40L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: cross-batch dups dropped, state bounded") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (event_id, ts_micros)
    // the state-bounded streaming dedup (StreamingLoad doc's scale note):
    // unlike dropDuplicates(event_id), state for a key is evicted one
    // watermark delay after its FIRST sighting, so state size tracks the
    // dup-arrival window, not the whole stream history
    val dedup = input.toDS().toDF("event_id", "ts")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 0L), (2L, 5 * M))
      q.processAllAvailable()
      input.addData((1L, 6 * M), (3L, 8 * M)) // dup of 1 inside the window
      q.processAllAvailable()
      val ids = spark.table("ddw_out").select(col("event_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join: click→purchase attribution window") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long)] // (user_id, ts_micros)
    val buys = MemoryStream[(Long, Long)]
    val c = clicks.toDS().toDF("user_id", "cts")
      .withColumn("cts", timestamp_micros(col("cts")))
      .withWatermark("cts", "10 minutes")
    val b = buys.toDS().toDF("buser", "bts")
      .withColumn("bts", timestamp_micros(col("bts")))
      .withWatermark("bts", "10 minutes")
    // purchase attributed to a click of the same user within 30 min —
    // the time-range condition is what bounds both join states
    val joined = c.join(b, col("user_id") === col("buser") &&
      col("bts") >= col("cts") &&
      col("bts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), unix_micros(col("cts")).as("cts"),
        unix_micros(col("bts")).as("bts"))
    val q = joined.writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      // base offset: an event time EQUAL to the current watermark (the
      // initial 1970-epoch zero) is dropped by the strict late-row
      // filter — keep all test times strictly above it
      val H = 60 * M
      clicks.addData((1L, H), (2L, H + 5 * M))
      buys.addData((1L, H + 10 * M), (1L, H + 40 * M), (3L, H + 10 * M))
      q.processAllAvailable()
      val rows = spark.table("attrib_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // user 1: buy@+10min matches click@+0; buy@+40min is outside the
      // 30-min window; user 2 clicked but never bought; user 3 bought
      // with no click
      assert(rows == Set((1L, H, H + 10 * M)))
    } finally q.stop()
  }

  test("batch sessionizer splits on the 30-minute gap exactly") {
    val df = Seq(
      Ev(7, 1, 0, 1.0), Ev(7, 2, Sessionize.gapMicros, 1.0), // gap == 30min: same session
      Ev(7, 3, 2 * Sessionize.gapMicros + 1, 1.0)) // gap > 30min: new session
      .toDF().withColumn("ts", timestamp_micros(col("ts")))
    val sessions = Sessionize.batch(df).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }
}
