package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.IncrementalLoad
import graft.ops.{Recovery, Snapshots, TargetedDelete}
import graft.tables.Catalog

/** Crash-recovery drills: manufacture the exact on-disk states each
  * publish protocol can strand (by replaying its steps and stopping
  * early), run the matching Recovery routine, and assert the table
  * reads back exactly right. Recovery must also be a no-op on healthy
  * tables and idempotent when re-run.
  */
class RecoverySpec extends SparkSuite {

  private val base = "/tmp/graft_recovery"
  private def fs = new Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def wipe(): Unit = { fs.delete(new Path(base), true); () }

  private def fact(offset: String): DataFrame =
    Catalog.events(spark, sf)
      .filter(col("ts") >= lit(offset).cast("timestamp"))
      .select(col("event_id"), col("ts").as("cdc_ts"), col("value"))

  private def params(lt: String, target: String) = IncrementalLoad.Params(
    loadType = lt, minimumDate = "2024-01-01", deltaDayCount = 3,
    targetPath = s"$base/$target", auditPath = s"$base/audit_$target",
    tableName = target, startTimestamp = "2024-02-01 00:00:00")

  private def rows(path: String): Seq[String] =
    IncrementalLoad.readTarget(spark, path)
      .collect().map(_.toString).sorted.toSeq

  test("incremental: crash between FULL retire and promote rolls forward") {
    wipe()
    IncrementalLoad.run(spark, params("FULL_LOAD", "t1"), fact, "cdc_ts")
    val want = rows(s"$base/t1")
    // manufacture the crash state: complete staging (with marker),
    // target renamed aside, promote never happened
    val target = new Path(s"$base/t1")
    val staging = new Path(s"$base/t1__staging")
    val retired = new Path(s"$base/t1__retired")
    fs.mkdirs(staging.getParent)
    // stage = a copy of the published target (what the run had written)
    spark.read.parquet(target.toString).write
      .partitionBy(IncrementalLoad.partCol).parquet(staging.toString)
    IncrementalLoad.writeMarker(fs, staging, "FULL")
    assert(fs.rename(target, retired))
    assert(!fs.exists(target))

    val log = Recovery.recoverIncrementalTarget(spark, s"$base/t1")
    assert(log.nonEmpty)
    assert(rows(s"$base/t1") == want)
    assert(!fs.exists(staging) && !fs.exists(retired))
    // idempotent on the now-healthy table
    assert(Recovery.recoverIncrementalTarget(spark, s"$base/t1").isEmpty)
  }

  test("incremental: markerless staging is rolled back untouched") {
    wipe()
    IncrementalLoad.run(spark, params("FULL_LOAD", "t2"), fact, "cdc_ts")
    val want = rows(s"$base/t2")
    val staging = new Path(s"$base/t2__staging")
    fs.mkdirs(staging) // half-written staging, no marker
    val log = Recovery.recoverIncrementalTarget(spark, s"$base/t2")
    assert(log == Seq("dropped incomplete __staging (no marker)"))
    assert(rows(s"$base/t2") == want && !fs.exists(staging))
  }

  test("torn cert file reads as ABSENT; staging with one rolls back") {
    wipe()
    IncrementalLoad.run(spark, params("FULL_LOAD", "t6"), fact, "cdc_ts")
    val want = rows(s"$base/t6")
    val staging = new Path(s"$base/t6__staging")
    fs.mkdirs(staging)
    // manufacture a torn marker: bytes written directly, no terminator
    // (as if the process died mid-write on a store without atomic
    // rename) — recovery must treat it as no-marker and roll BACK,
    // never roll forward on a truncated partition list
    val out = fs.create(new Path(staging, IncrementalLoad.markerName), true)
    try out.write("DELTA 2024-01-15\ncdc_day=2024-01-1".getBytes("UTF-8"))
    finally out.close()
    assert(IncrementalLoad.readMarker(fs, staging).isEmpty)
    val log = Recovery.recoverIncrementalTarget(spark, s"$base/t6")
    assert(log.contains("dropped incomplete __staging (no marker)"))
    assert(rows(s"$base/t6") == want && !fs.exists(staging))
  }

  test("stale publish marker inside the target is swept on recovery") {
    wipe()
    IncrementalLoad.run(spark, params("FULL_LOAD", "t7"), fact, "cdc_ts")
    val want = rows(s"$base/t7")
    // crash point: staging renamed into the target (marker rode along),
    // process died before the marker delete — staging no longer exists
    val stranded = new Path(s"$base/t7", IncrementalLoad.markerName)
    graft.ops.CertFile.write(fs, stranded, "FULL")
    val log = Recovery.recoverIncrementalTarget(spark, s"$base/t7")
    assert(log == Seq("dropped stale publish marker inside target"))
    assert(!fs.exists(stranded) && rows(s"$base/t7") == want)
    assert(Recovery.recoverIncrementalTarget(spark, s"$base/t7").isEmpty)
  }

  test("incremental: crash mid-DELTA swap (partition retired, staged not moved) rolls forward") {
    wipe()
    IncrementalLoad.run(spark, params("FULL_LOAD", "t3"), fact, "cdc_ts")
    val r = IncrementalLoad.run(spark, params("DELTA", "t3"), fact, "cdc_ts")
    val want = rows(s"$base/t3")
    val target = new Path(s"$base/t3")
    // pick a published lookback partition and rewind it to the
    // mid-swap crash state: dest renamed to .P.retire, staged P present
    val offsetDay = r.offset.take(10)
    val lookbackParts = fs.listStatus(target).map(_.getPath.getName)
      .filter(n => n.matches("cdc_day=\\d{4}-\\d{2}-\\d{2}") &&
        n.stripPrefix("cdc_day=") >= offsetDay).sorted
    assert(lookbackParts.size >= 2) // the drill needs moved + unmoved parts
    val part = lookbackParts.last // the one whose swap "crashed"
    val staging = new Path(s"$base/t3__staging")
    fs.mkdirs(new Path(staging, part).getParent)
    assert(fs.rename(new Path(target, part), new Path(staging, part)))
    // the real marker listed EVERY staged partition; the others were
    // already swapped in by the crashed attempt
    IncrementalLoad.writeMarker(fs, staging,
      (s"DELTA $offsetDay" +: lookbackParts.toSeq).mkString("\n"))
    // the old dest, renamed aside by the crashed attempt
    fs.mkdirs(new Path(target, s".$part.retire"))

    val log = Recovery.recoverIncrementalTarget(spark, s"$base/t3")
    assert(log.exists(_.contains("re-ran DELTA publish")))
    assert(rows(s"$base/t3") == want)
    assert(!fs.exists(staging))
    assert(fs.listStatus(target).forall(!_.getPath.getName.endsWith(".retire")))
  }

  test("targeted delete: crash after hit-file deletion completes from the manifest") {
    wipe()
    val dir = s"$base/erase"
    Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartitionByRange(8, col("user_id"))
      .write.parquet(dir)
    val want = spark.read.parquet(dir)
      .filter(!col("user_id").isin(7L))
      .collect().map(_.toString).sorted.toSeq

    // manufacture: staged survivors + manifest written, hit files
    // deleted, staged files NOT moved in (the worst crash point)
    val stats = graft.ops.DataSkipping.buildStats(spark, dir, "user_id")
      .select(col("file"), col("min_v").cast("long"), col("max_v").cast("long"))
      .collect()
    val hit = stats.filter(r => 7L >= r.getLong(1) && 7L <= r.getLong(2))
      .map(_.getString(0))
    assert(hit.nonEmpty)
    val staging = new Path(dir, ".erase_staging")
    spark.read.parquet(hit.toIndexedSeq: _*)
      .filter(!col("user_id").isin(7L))
      .write.parquet(staging.toString)
    graft.ops.CertFile.write(fs,
      new Path(staging, TargetedDelete.manifestName), hit.mkString("\n"))
    hit.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))

    val log = Recovery.completeErase(spark, dir)
    assert(log.exists(_.contains("completed erase")))
    val got = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(got == want)
    assert(Recovery.completeErase(spark, dir).isEmpty) // idempotent
  }

  test("targeted delete: manifestless staging is rolled back") {
    wipe()
    val dir = s"$base/erase2"
    Catalog.events(spark, sf).select(col("event_id"), col("user_id"))
      .write.parquet(dir)
    val want = spark.read.parquet(dir).count()
    fs.mkdirs(new Path(dir, ".erase_staging"))
    val log = Recovery.completeErase(spark, dir)
    assert(log == Seq("dropped incomplete .erase_staging (no manifest)"))
    assert(spark.read.parquet(dir).count() == want)
  }

  test("snapshots: stranded staging dirs are swept, versions untouched") {
    wipe()
    val snapBase = s"$base/snaps"
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    Snapshots.publish(spark, snapBase, o.limit(5))
    fs.mkdirs(new Path(snapBase, ".v=2__staging__crashed"))
    val log = Recovery.cleanSnapshotStaging(spark, snapBase)
    assert(log == Seq("dropped stranded .v=2__staging__crashed"))
    assert(Snapshots.versions(spark, snapBase) == Seq(1))
    assert(Snapshots.asOf(spark, snapBase).count() == 5)
  }
}
