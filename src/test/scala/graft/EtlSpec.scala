package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Fact, IncrementalLoad}
import graft.queries.EtlQueries
import graft.tables.Catalog

class FactBranchesSpec extends SparkSuite {
  test("branch schemas are identical and the union preserves counts (D4)") {
    val u = Fact.build(spark, sf, EtlQueries.itemStatusOffset,
      EtlQueries.chinaOffset, EtlQueries.tomfordOffset)
    assert(u.columns.toSeq == Fact.columns)
    val parts = Seq(
      graft.etl.ItemStatus.build(spark, sf, EtlQueries.itemStatusOffset),
      graft.etl.AggChina.build(spark, sf, EtlQueries.chinaOffset),
      graft.etl.Tomford.build(spark, sf, EtlQueries.tomfordOffset))
    assert(u.count() == parts.map(_.count()).sum)
  }

  test("reference key expression is unique over the fact (ref sql:341)") {
    val u = Fact.build(spark, sf, EtlQueries.itemStatusOffset,
      EtlQueries.chinaOffset, EtlQueries.tomfordOffset)
    val keyed = u.select(concat_ws("§", col("fact_item_status_key"),
      col("line_item_status"), col("latest_status"), col("trans_order_id"),
      col("cart_id")).as("k"))
    assert(keyed.count() == keyed.distinct().count())
  }

  test("null-tolerant join keeps rows with null region/brand (J3)") {
    val b1 = graft.etl.ItemStatus.build(spark, sf, EtlQueries.itemStatusOffset)
    // rows from orders with injected-null region (o_orderkey % 13 == 0)
    // must survive the inner join
    assert(b1.filter(col("trans_order_id") % 13 === 0).count() > 0)
  }

  test("LEFT joins produce the expected null-path markers") {
    val b1 = graft.etl.ItemStatus.build(spark, sf, EtlQueries.itemStatusOffset)
    assert(b1.filter(col("product_key") === "UNKNOWN").count() > 0) // p_size pin
    val b2 = graft.etl.AggChina.build(spark, sf, EtlQueries.chinaOffset)
    assert(b2.filter(col("item_status_key") === "ST-NA").count() > 0) // 'CANCELLED 01'
    assert(b2.filter(col("channel_key") === 0).count() == 0) // error rows filtered
  }
}

class IncrementalLoadSpec extends SparkSuite {
  private val base = "/tmp/graft_test_incr"

  private def wipe(): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
  }

  private def fact(horizon: Option[String])(offset: String): DataFrame = {
    val src = Catalog.events(spark, sf)
      .filter(col("ts") >= lit(offset).cast("timestamp"))
    horizon.fold(src)(h => src.filter(col("ts") < lit(h).cast("timestamp")))
      .select(col("event_id"), col("ts").as("cdc_ts"), col("value"))
  }

  private def params(lt: String, target: String) = IncrementalLoad.Params(
    loadType = lt, minimumDate = "2024-01-01", deltaDayCount = 3,
    targetPath = s"$base/$target", auditPath = s"$base/audit_$target",
    tableName = target, startTimestamp = "2024-02-01 00:00:00")

  test("delta-offset aggregate folds from the latest partition's footers") {
    wipe()
    // a MICROS-written protocol target (the test session default)
    IncrementalLoad.run(spark, params("FULL_LOAD", "fold"), fact(None),
      "cdc_ts")
    val target = spark.read.parquet(s"$base/fold")
    val latest = target.select(max(col(IncrementalLoad.partCol))).first()
      .getDate(0).toString
    val aggDf = target
      .filter(col(IncrementalLoad.partCol) === lit(latest))
      .agg(date_format(max(col("cdc_ts")) - expr("INTERVAL 3 DAYS"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    val folded = graft.ops.MetadataMax
      .rewrite(spark, aggDf.queryExecution.optimizedPlan)
    assert(folded.nonEmpty,
      "the protocol's pruned offset aggregate must take the footer path")
    val viaFooter = graft.ops.MetadataMax.evalFolded(folded.get)
    assert(viaFooter.nonEmpty,
      s"the folded plan must evaluate driver-side:\n${folded.get.treeString}")
    assert(viaFooter.get === aggDf.first())
  }

  test("C3/§5.3 invariant: FULL_LOAD == (delta ∘ prefix) on the same input") {
    wipe()
    // path A: one FULL_LOAD over everything
    IncrementalLoad.run(spark, params("FULL_LOAD", "a"), fact(None), "cdc_ts")
    // path B: FULL_LOAD of a prefix, then a delta over everything
    IncrementalLoad.run(spark, params("FULL_LOAD", "b"),
      fact(Some("2024-01-15")), "cdc_ts")
    IncrementalLoad.run(spark, params("DELTA", "b"), fact(None), "cdc_ts")
    assertSameRows(IncrementalLoad.readTarget(spark, s"$base/a"),
      IncrementalLoad.readTarget(spark, s"$base/b"))
  }

  test("A4 audit counts equal actual row deltas; comparators are §7.4.5") {
    wipe()
    val r1 = IncrementalLoad.run(spark, params("FULL_LOAD", "c"),
      fact(Some("2024-01-15")), "cdc_ts")
    assert(r1.deleted == 0)
    assert(r1.inserted == IncrementalLoad.readTarget(spark, s"$base/c").count())
    // materialize before the delta swaps the files out from under the path
    val beforeTs = IncrementalLoad.readTarget(spark, s"$base/c")
      .select(col("cdc_ts").cast("string")).collect().map(_.getString(0))
    val r2 = IncrementalLoad.run(spark, params("DELTA", "c"), fact(None), "cdc_ts")
    // strict `>` delete: offset boundary rows stay
    assert(r2.deleted == beforeTs.count(_ > r2.offset))
    val audit = spark.read.parquet(s"$base/audit_c")
    assert(audit.count() == 2)
    assert(audit.filter(col("load_type") === "DELTA")
      .first().getAs[Long]("deleted_count") == r2.deleted)
  }

  test("fresh branch union executes exactly once per run (A4 via observe)") {
    wipe()
    // A per-row accumulator inside the fresh dataflow: if the protocol
    // still counted @@row_count with a separate `.count()` action, the
    // union would evaluate twice and the accumulator would read ~2×
    // the inserted count. (Test-only UDF; main stays UDF-free.)
    val acc = spark.sparkContext.longAccumulator("fresh_rows_seen")
    val tick = org.apache.spark.sql.functions.udf { (_: Long) =>
      acc.add(1L); true
    }
    def freshCounted(offset: String): DataFrame =
      fact(None)(offset).filter(tick(col("event_id")))
    val r1 = IncrementalLoad.run(spark, params("FULL_LOAD", "obs"),
      freshCounted, "cdc_ts")
    assert(r1.inserted > 0)
    assert(acc.value == r1.inserted,
      s"full load evaluated the fresh union ${acc.value}/${r1.inserted} times")
    acc.reset()
    val r2 = IncrementalLoad.run(spark, params("DELTA", "obs"),
      freshCounted, "cdc_ts")
    assert(acc.value == r2.inserted,
      s"delta evaluated the fresh union ${acc.value}/${r2.inserted} times")
  }

  test("full protocol over the real 25-col fact pins §7.4.5 comparators") {
    wipe()
    // the reference's fresh branches filter on cdc >= offset (P4); apply
    // the same to the union for the single-offset protocol
    val fresh = (offset: String) => Fact.build(spark, sf,
      EtlQueries.itemStatusOffset, EtlQueries.chinaOffset,
      EtlQueries.tomfordOffset)
      .filter(col("cdc_timestamp_gcp") >= lit(offset).cast("timestamp"))
    val p = params("FULL_LOAD", "fact").copy(deltaDayCount = 2,
      minimumDate = "1990-01-01")
    IncrementalLoad.run(spark, p, fresh, "cdc_timestamp_gcp")
    val full = IncrementalLoad.readTarget(spark, s"$base/fact")
    val afterFull = full.collect().map(_.toString).sorted.toSeq
    assert(afterFull.nonEmpty)
    // delta replay of the same source: delete is STRICT >, insert is >=
    // (§7.4.5 verbatim) — so rows at exactly the offset are kept AND
    // reinserted. With day-floored CDC values the offset lands on a data
    // timestamp, making this observable: expected = full ∪ boundary.
    val offsetStr = full.agg(date_format(
      max(col("cdc_timestamp_gcp")) - expr("INTERVAL 2 DAYS"),
      "yyyy-MM-dd HH:mm:ss.SSSSSS")).first().getString(0)
    val boundary = full.filter(
      col("cdc_timestamp_gcp") === lit(offsetStr).cast("timestamp"))
      .collect().map(_.toString).toSeq
    assert(boundary.nonEmpty) // day-floored cdc → boundary hit by design
    val r = IncrementalLoad.run(spark, p.copy(loadType = "DELTA"),
      fresh, "cdc_timestamp_gcp")
    assert(r.deleted > 0 && r.inserted >= r.deleted)
    val afterDelta = IncrementalLoad.readTarget(spark, s"$base/fact").collect()
      .map(_.toString).sorted.toSeq
    assert(afterDelta == (afterFull ++ boundary).sorted)
  }

  test("offset falls back to minimum_date when target is empty") {
    wipe()
    val r = IncrementalLoad.run(spark, params("DELTA", "d"),
      fact(Some("2024-01-05")), "cdc_ts")
    assert(r.offset == "2024-01-01")
  }

  test("NULL-cdc partition: history kept, fresh nulls merged on delta") {
    wipe()
    import SparkSpec.spark.implicits._
    def mk(rows: Seq[(Long, Option[String], Double)]): DataFrame =
      rows.toDF("event_id", "cdc_s", "value").select(col("event_id"),
        col("cdc_s").cast("timestamp").as("cdc_ts"), col("value"))
    // FULL_LOAD seeds a dated partition and a NULL-cdc row
    IncrementalLoad.run(spark, params("FULL_LOAD", "n"),
      _ => mk(Seq((1L, Some("2024-01-10 00:00:00"), 1.0), (2L, None, 2.0))),
      "cdc_ts")
    // delta brings one dated row and one MORE null-cdc row; the old
    // null row must survive (NULL never matches `cdc > offset`) and the
    // fresh one must merge in beside it
    IncrementalLoad.run(spark, params("DELTA", "n"),
      _ => mk(Seq((3L, Some("2024-01-12 00:00:00"), 3.0), (4L, None, 4.0))),
      "cdc_ts")
    val rows = IncrementalLoad.readTarget(spark, s"$base/n")
      .select(col("event_id"), col("cdc_ts").cast("string")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows.keySet == Set(2L, 3L, 4L)) // 1 deleted by lookback, 2 KEPT
    assert(rows(2L).isEmpty && rows(4L).isEmpty)
  }

  test("S5 at scale: a delta run rewrites ONLY lookback partitions") {
    wipe()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tgt = new org.apache.hadoop.fs.Path(s"$base/e")
    IncrementalLoad.run(spark, params("FULL_LOAD", "e"), fact(None), "cdc_ts")
    // (partition dir name, file name, mtime) fingerprint of the target
    def files(): Map[String, Seq[(String, Long)]] =
      fs.listStatus(tgt).filter(_.getPath.getName.startsWith("cdc_day="))
        .map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(f => (f.getPath.getName, f.getModificationTime)).toSeq.sorted
        }.toMap
    val before = files()
    assert(before.size > 1, "target must be date-partitioned")
    val r = IncrementalLoad.run(spark, params("DELTA", "e"), fact(None), "cdc_ts")
    val after = files()
    val offsetDay = r.offset.take(10)
    val (hist, look) = before.keys.partition(
      _.stripPrefix("cdc_day=") < offsetDay)
    assert(hist.nonEmpty && look.nonEmpty) // both regimes exercised
    // history partitions: identical files, never rewritten
    hist.foreach(d => assert(after(d) == before(d),
      s"history partition $d was rewritten by a delta run"))
    // lookback partitions: fully rewritten (no stale file survives)
    look.foreach(d => assert(
      after(d).map(_._1).intersect(before(d).map(_._1)).isEmpty ||
        after(d) != before(d),
      s"lookback partition $d was not rewritten"))
  }
}

class CompactSpec extends SparkSuite {
  test("compaction: fewer balanced files, identical rows, staged swap") {
    val path = "/tmp/graft_compact/events"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    // fragment: 64 small files
    val src = Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    src.repartition(64).write.parquet(path)
    def files(): Seq[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath.getName
        if (f.endsWith(".parquet")) b += f
      }
      b.result()
    }
    assert(files().size == 64)
    val before = src.collect().map(_.toString).sorted.toSeq
    val total = graft.ops.Compact.parquetBytes(spark, path)
    val n = graft.ops.Compact.compact(spark, path, targetBytes = total / 4 + 1)
    assert(n == 4 && files().size == 4)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compact")))
    val after = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("clusterBy compaction restores a skippable layout (OPTIMIZE/ZORDER analog)") {
    val path = "/tmp/graft_compact/events_clustered"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val src = Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    // round-robin fragmentation: every file spans the full user range,
    // so zone maps prune nothing
    src.repartition(8).write.parquet(path)
    def survivors(): Long = {
      val stats = graft.ops.DataSkipping.buildStats(spark, path, "user_id")
      stats.filter(col("max_v") >= 3 && col("min_v") <= 4).count()
    }
    assert(survivors() == 8, "unclustered files should all overlap")
    val before = src.collect().map(_.toString).sorted.toSeq
    val total = graft.ops.Compact.parquetBytes(spark, path)
    graft.ops.Compact.compact(spark, path, targetBytes = total / 8 + 1,
      clusterBy = Seq("user_id"))
    // a 2-user slice of ~15 users clustered into 8 files → ≤3 overlap
    assert(survivors() <= 3,
      s"clustered layout should localize the slice, got ${survivors()}")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("selective compaction: only the small-file tail is rewritten") {
    val path = "/tmp/graft_compact/events_selective"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    val src = Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    // 2 big files + a 12-file small tail (the long-lived-ingest shape)
    src.filter(col("event_id") % 4 =!= 0).repartition(2)
      .write.parquet(path)
    src.filter(col("event_id") % 4 === 0).repartition(12)
      .write.mode("append").parquet(path)
    def listing(): Map[String, Long] = {
      val it = fs.listFiles(p, false)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.getName -> f.getLen
      }
      b.result()
    }
    val before = listing()
    val bigs = before.filter(_._2 >= before.values.max / 2).keySet
    assert(before.size == 14 && bigs.size == 2)
    val rows = src.collect().map(_.toString).sorted.toSeq
    // cut below the merged-tail size so the compacted output itself
    // is no longer "small" — size-selection's fixpoint (at this sf the
    // 12 smalls sum to several times the cut once per-file parquet
    // overhead collapses)
    val smallCut = before.values.max / 2
    val tailBytes = before.filter(_._2 < smallCut).values.sum
    val n = graft.ops.Compact.compactSmall(spark, path,
      targetBytes = tailBytes + 1, smallBytes = smallCut)
    val after = listing()
    assert(n == 1 && after.size == 3,
      s"12-file tail should become 1 file, got $after")
    // the big files kept their exact names AND bytes — zero rewrite
    bigs.foreach(b => assert(after(b) == before(b)))
    assert(spark.read.parquet(path).collect().map(_.toString).sorted
      .toSeq == rows)
    // fixpoint: the merged tail is no longer small → second pass no-ops
    assert(graft.ops.Compact.compactSmall(spark, path,
      targetBytes = tailBytes + 1, smallBytes = smallCut) == 0)
  }

  test("selective compaction recurses into partitioned layouts") {
    val path = "/tmp/graft_compact/events_partitioned"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    val src = Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("user_id") % 2).as("shard"))
    // each partition dir gets a big file + an 8-file small tail
    src.filter(col("event_id") % 4 =!= 0).repartition(1)
      .write.partitionBy("shard").parquet(path)
    src.filter(col("event_id") % 4 === 0).repartition(8)
      .write.partitionBy("shard").mode("append").parquet(path)
    def leafFiles(shard: Int): Map[String, Long] = {
      val it = fs.listFiles(
        new org.apache.hadoop.fs.Path(path, s"shard=$shard"), false)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.getName -> f.getLen
      }
      b.result()
    }
    val before0 = leafFiles(0); val before1 = leafFiles(1)
    assert(before0.size == 9 && before1.size == 9)
    val rows = src.collect().map(_.toString).sorted.toSeq
    val cut = math.min(before0.values.max, before1.values.max) / 2
    val tailBytes = (before0.values ++ before1.values).filter(_ < cut).sum
    // a partitioned target must compact EVERY leaf, not silently no-op
    val n = graft.ops.Compact.compactSmall(spark, path,
      targetBytes = tailBytes + 1, smallBytes = cut)
    assert(n == 2, s"one merged tail per partition, got $n")
    val after0 = leafFiles(0); val after1 = leafFiles(1)
    assert(after0.size == 2 && after1.size == 2,
      s"each leaf: big + merged tail, got $after0 / $after1")
    // the big file of each partition kept its exact name and bytes
    val big0 = before0.maxBy(_._2); val big1 = before1.maxBy(_._2)
    assert(after0(big0._1) == big0._2 && after1(big1._1) == big1._2)
    assert(spark.read.parquet(path).collect().map(_.toString).sorted
      .toSeq == rows)
  }

  test("selective compaction crash drill: manifest rolls forward, none rolls back") {
    val path = "/tmp/graft_compact/events_crash"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    val src = Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    src.repartition(6).write.parquet(path)
    val rows = src.collect().map(_.toString).sorted.toSeq
    val staging = new org.apache.hadoop.fs.Path(path, ".erase_staging")

    // CRASH POINT A (before the manifest): staged bytes exist, no
    // cert — recovery must roll BACK, table untouched
    spark.read.parquet(path).limit(10).coalesce(1)
      .write.parquet(staging.toString)
    graft.ops.Recovery.completeErase(spark, path)
    assert(!fs.exists(staging))
    assert(spark.read.parquet(path).collect().map(_.toString).sorted
      .toSeq == rows)

    // CRASH POINT B (manifest written, originals not yet dropped):
    // recovery must roll FORWARD — originals go, staged files move in
    val smalls = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    fs.delete(staging, true)
    spark.read.parquet(
        smalls.map(_.getPath.toString).toIndexedSeq: _*)
      .repartition(1).write.parquet(staging.toString)
    graft.ops.CertFile.write(fs,
      new org.apache.hadoop.fs.Path(staging,
        graft.ops.TargetedDelete.manifestName),
      smalls.map(_.getPath.toString).mkString("\n"))
    graft.ops.Recovery.completeErase(spark, path)
    assert(!fs.exists(staging))
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    assert(names.length == 1, s"6 originals → 1 compacted, got ${names.toSeq}")
    assert(spark.read.parquet(path).collect().map(_.toString).sorted
      .toSeq == rows)
  }
}
