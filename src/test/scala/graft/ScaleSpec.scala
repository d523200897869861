package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.tables.Catalog

/** Scale-behavior assertions: these verify the PLAN SHAPES that make the
  * engine viable at 100 TB — date-partition pruning of incremental scans
  * and shuffle-free co-located joins over bucketed tables — not just row
  * results.
  */
class ScaleSpec extends SparkSuite {

  private def fileScans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }

  test("date-partitioned fact: delta filter prunes partitions at the scan") {
    val path = "/tmp/graft_scale/events_by_day"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    Catalog.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

    val pruned = spark.read.parquet(path)
      .filter(col("event_date") >= lit("2024-01-25"))
    val scan = fileScans(pruned).head
    val totalDays = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.startsWith("event_date="))
    // the scan must see only the lookback window's partitions
    assert(scan.relation.partitionSchema.fieldNames.contains("event_date"))
    assert(scan.metadata("PartitionFilters").contains("event_date"))
    val selected = scan.selectedPartitions.partitionCount
    assert(selected < totalDays && selected <= 7,
      s"expected <=7 of $totalDays day partitions, scanned $selected")
  }

  test("bucketed tables: co-located join plans with zero shuffles") {
    val wfs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // in-memory catalog forgets tables across JVMs; the warehouse dir
      // doesn't — clear the orphaned location
      wfs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t"), true)
    }
    Catalog.orders(spark, sf).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("graft_orders_b")
    Catalog.lineitem(spark, sf).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("graft_lineitem_b")

    val j = spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")))
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // bucketing co-locates the join; only the final small aggregation
    // may shuffle
    val joinShuffles = shuffles.filterNot(
      _.outputPartitioning.numPartitions <= 8)
    assert(shuffles.size <= 1,
      s"expected at most the agg shuffle, got ${shuffles.size}")
    assert(fileScans(j).forall(_.bucketedScan),
      "both sides must use the bucketed scan")
    assert(joinShuffles.isEmpty || shuffles.size <= 1)
    // and the join result is correct
    assert(j.count() == 3)
  }

  test("round-5 corpus operators keep every window keyed") {
    // the packing (q79) and shard (q83) windows must partition by their
    // shard column — an unkeyed window serializes the corpus through
    // one task (the q87 naive form this library exists to avoid)
    for (q <- Seq(graft.queries.CorpusQueries.q79,
        graft.queries.CorpusQueries.q83)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"${q.name} plans an unkeyed window:\n$plan")
    }
  }

  test("round-5 window operators keep their windows keyed") {
    // interval merge (q120), EWMA (q121), and group sampling (q123)
    // must all partition their windows; q129's cumulative sum IS
    // unpartitioned but runs post-aggregation over |days| rows, so it
    // is exempt here and documented in PERF.md
    for (q <- Seq(graft.queries.AnalyticsQueries.q120,
        graft.queries.AnalyticsQueries.q121,
        graft.queries.PipelineQueries.q123)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"${q.name} plans an unkeyed window:\n$plan")
    }
  }

  test("q120 interval merge: both windows share one exchange") {
    val df = graft.queries.AnalyticsQueries.q120.run(spark, sf)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // prev-end max, island sum and the (user, island) roll-up must all
    // reuse the user_id partitioning: one exchange total
    assert(shuffles.size <= 1,
      s"expected 1 shared exchange, got ${shuffles.size}")
  }

  test("q122 outlier flags broadcast the stats, never shuffle the events twice") {
    val df = graft.queries.AnalyticsQueries.q122.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"suffstats must come back via broadcast:\n$plan")
  }

  test("q96 incremental run shingles only the delta batch") {
    val out = graft.queries.DedupQueries.q96.run(spark, sf)
    out.collect()
    // the incremental stage must source history from the STORED index,
    // not recompute it: the final plan reads the dedup_index_ store
    // (the delta-side document scan sits under the persisted delta-sig
    // relation and is therefore delta-filtered by construction)
    // (string probe: AQE wraps the plan, so FileSourceScanExec nodes
    // aren't reachable via collect here)
    assert(out.queryExecution.executedPlan.toString
      .contains("dedup_index_"),
      "incremental run must read the persisted signature index")
  }

  test("BPE encode plan size is O(1) in the merge-table size") {
    import org.apache.spark.sql.functions._
    // the nested-replace formulation grew the expression tree linearly
    // with the table (and overflowed the stack near 1k rules); the
    // iterative encoder carries the table as ONE reference object, so
    // the PLAN must not grow when the table does — that is the whole
    // scale claim. Compare plan text for a 10-rule vs the full pinned
    // 1k-rule table: identical shape, identical size.
    val docs = graft.tables.Catalog.documents(spark, sf).limit(10)
    def planLen(ms: Seq[(String, String)]): Int =
      docs.select(graft.ops.Bpe.tokenCountWith(col("text"), ms).as("n"))
        .queryExecution.executedPlan.toString.length
    val small = planLen(graft.ops.Bpe.merges.take(10))
    val full = planLen(graft.ops.Bpe.merges)
    // identical up to the printed rule COUNT ("10" vs "1024" merges)
    assert(full <= small + 16,
      s"plan grew with the merge table: $small -> $full chars")
  }

  test("BPE heap encoder handles a 100k-char document and equals the " +
      "round-scan path") {
    // the book-length tail of a 100 TB corpus: past BpeEncode's
    // HeapThreshold the encoder switches from the O(len × rules_fired)
    // round scan to the linked-list + min-heap O(n log n) path — both
    // must produce identical encodings under the full pinned table
    val table = new graft.functions.BpeEncode.Table(graft.ops.Bpe.merges)
    val phrase = "the quick brown fox jumps over the lazy dog and " +
      "every customer account ships final status packages daily "
    val sb = new StringBuilder
    var i = 0
    while (sb.length < 120000) {
      sb.append(phrase)
      sb.append("doc").append(i % 97).append(' ') // break exact periodicity
      i += 1
    }
    val text = sb.toString.trim.replaceAll("\\s+", " ")
    assert(text.length >= graft.functions.BpeEncode.HeapThreshold * 50)
    val viaHeap = table.encodeTextForced(text, heap = true)
    val viaRounds = table.encodeTextForced(text, heap = false)
    assert(viaHeap == viaRounds, "heap and round-scan encodings diverge")
    // character conservation on the heap path
    val rejoined = viaHeap.toString
      .replace(graft.functions.BpeEncode.B.toString, "")
      .replace(graft.functions.BpeEncode.E.toString, "")
    assert(rejoined == text)
    // the dispatch itself: a full-row encode through the column surface
    // (tokens concatenate back to the normalized text)
    import SparkSpec.spark.implicits._
    val got = Seq(text).toDF("text")
      .select(concat_ws("", graft.ops.Bpe.tokens(org.apache.spark.sql
        .functions.col("text"))).as("r"))
      .first().getString(0)
    assert(got == text)
  }

  test("q138 probe reads the stored ANN index and retrains nothing") {
    val out = graft.queries.SimilarityQueries.q138.run(spark, sf)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // cell membership must come from the MATERIALIZED index...
    assert(plan.contains("/ann_index/"),
      s"probe must read the persisted assignments:\n$plan")
    // ...and the probe plan must not contain the training/update shape
    // (Lloyd passes explode (vec, dim) rows and re-aggregate by
    // (cid, pos); the probe is zip_with projections + joins only)
    assert(!plan.contains("posexplode"),
      s"probe plan contains a dim-explode — it is retraining:\n$plan")
  }

  test("stored-token consumers read the store, never the encoder") {
    // the q138 guard, for the dt store: token consumers must plan a
    // parquet read of spark_dt_*, with ZERO BpeEncode expressions —
    // an encoder in the plan means the store amortization regressed
    for (q <- Seq(graft.queries.TextQueries.q137,
        graft.queries.CorpusQueries.q142,
        graft.queries.TextQueries.q155)) {
      val out = q.run(spark, sf)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("spark_dt_"),
        s"${q.name} must read the token store:\n${plan.take(2000)}")
      assert(!plan.contains("bpe_encode") && !plan.contains("BpeEncode"),
        s"${q.name} plan still runs the encoder:\n${plan.take(2000)}")
    }
    // and the anchor keeps the LIVE encoder
    val anchor = graft.queries.TextQueries.q162.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(anchor.contains("bpe_encode") || anchor.contains("BpeEncode"),
      "q162 must stay the independent live-encoder replay")
  }
}
