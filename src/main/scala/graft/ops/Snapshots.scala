package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED TABLE SNAPSHOTS: time travel + retention over plain
  * parquet — the minimal table-format core (Delta/Iceberg's versioned
  * metadata) expressed as one directory per version:
  *
  *   base/v=1/   base/v=2/   ...   (highest N = current)
  *
  * `publish` writes the new version to a dot-prefixed staging dir and
  * RENAMES it in — readers never observe a partial version, and the
  * current version is defined by directory listing alone (no manifest
  * file to corrupt; the rename is the commit point). A crash before
  * the rename strands only an invisible `.v=N__staging__<attempt>`
  * dir (unique per publisher; swept by vacuum/Recovery).
  *
  * Scale notes: versions share no storage here (each is a full
  * snapshot) — at 100 TB the incremental protocols are what keep
  * publishes cheap ([[graft.etl.IncrementalLoad]] rewrites only
  * lookback partitions; [[TargetedDelete]] only hit files); snapshot
  * versioning composes with them by versioning METADATA granularity
  * (partition dirs), which this layout reaches by making each `v=N`
  * hold per-partition hard links rather than copies. `asOf` reads are
  * a directory choice — zero read-path overhead. `vacuum` bounds
  * storage to the retention window, exactly like `VACUUM` /
  * `expire_snapshots`.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, base: String): FileSystem =
    FileSystem.get(new Path(base).toUri,
      spark.sparkContext.hadoopConfiguration)

  private def versionsOf(fs: FileSystem, base: String): Seq[Int] = {
    val p = new Path(base)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.matches("v=\\d+"))
      .map(_.stripPrefix("v=").toInt)
      .toSeq.sorted
  }

  def versions(spark: SparkSession, base: String): Seq[Int] =
    versionsOf(fsFor(spark, base), base)

  def latestVersion(spark: SparkSession, base: String): Option[Int] =
    versions(spark, base).lastOption

  /** Write `df` as the next version; returns the new version number.
    * The staged write + rename is the commit point. */
  def publish(spark: SparkSession, base: String, df: DataFrame): Int =
    publishAs(spark, base, df,
      versionsOf(fsFor(spark, base), base).lastOption.getOrElse(0) + 1)

  /** Publish `df` at an EXPLICIT version — the commit tail of
    * [[publish]], separated so the lost-race path (version taken
    * between the listing and the rename) is directly exercisable.
    *
    * The staging name is UNIQUE PER PUBLISHER (attempt id suffix):
    * if two racers for v=N shared one staging path, the commit test
    * in [[verifyCommit]] could swap outcomes — the loser's rename
    * nests under dest before the winner verifies, the winner then
    * withdraws the nested dir and mis-reports "lost race", and the
    * loser later finds nothing nested and mis-reports success. With
    * unique names each publisher probes only for its OWN staging dir,
    * and the pre-rename clobber window on a shared path is gone. */
  private[graft] def publishAs(spark: SparkSession, base: String,
      df: DataFrame, next: Int,
      attemptId: String = java.util.UUID.randomUUID.toString): Int = {
    val fs = fsFor(spark, base)
    val staging = new Path(base, s".v=${next}__staging__$attemptId")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(base, s"v=$next")
    // Hadoop rename into an EXISTING directory nests the source inside
    // it — a lost publish race (next-version is computed by listing)
    // would otherwise "succeed" while the new data lands invisible
    // under dest as a dot-prefixed child. Fail loudly instead.
    require(!fs.exists(dest),
      s"v=$next already exists — concurrent publish lost the race")
    require(fs.rename(staging, dest), s"commit rename failed for v=$next")
    verifyCommit(fs, dest, staging.getName, next)
    next
  }

  /** The exists() check in [[publishAs]] is check-then-act: two
    * publishers can both pass it, and the loser's rename into the
    * now-existing dir nests its staging silently. The RENAME is the
    * real commit test: a won race leaves dest's files at the top
    * level; a lost race leaves THIS publisher's (unique) staging dir
    * nested under dest. Each publisher probes only for its own
    * staging name, so concurrent verifiers cannot confuse each
    * other's outcomes. Detect, withdraw the nested data (the winner's
    * files are untouched beside it), and fail. */
  private[graft] def verifyCommit(fs: org.apache.hadoop.fs.FileSystem,
      dest: Path, stagingName: String, next: Int): Unit = {
    val nested = new Path(dest, stagingName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new IllegalStateException(
        s"v=$next lost a concurrent publish race — staged data withdrawn")
    }
  }

  /** Time-travel read: the table as of `version` (default: current). */
  def asOf(spark: SparkSession, base: String, version: Int = -1): DataFrame = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no versions under $base")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"version $v not in $vs (vacuumed or never published)")
    spark.read.parquet(s"$base/v=$v")
  }

  /** Retention: drop all but the newest `keepLast` versions; returns
    * the versions removed. Never removes the current version. Also
    * sweeps stranded staging dirs for versions that already committed
    * — with per-publisher-unique staging names a crashed attempt's
    * dir is never reclaimed by a retry, and once `v=N` exists no
    * staging for N can ever rename in, so they are pure garbage. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the current version")
    val fs = fsFor(spark, base)
    val vs = versionsOf(fs, base)
    val drop = vs.dropRight(keepLast)
    drop.foreach(v => fs.delete(new Path(base, s"v=$v"), true))
    val latest = vs.lastOption.getOrElse(0)
    fs.listStatus(new Path(base)).iterator
      .map(_.getPath)
      .filter(_.getName.matches("\\.v=\\d+__staging.*"))
      .filter(_.getName.stripPrefix(".v=").takeWhile(_.isDigit).toInt <= latest)
      .foreach(p => fs.delete(p, true))
    drop
  }
}
