package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TARGETED (GDPR-style) hard delete: physically remove every row whose
  * key is tombstoned while rewriting ONLY the files that can contain
  * one — the deletion analog of [[DataSkipping]]'s pruned read, and the
  * mechanism behind Delta/Iceberg `DELETE WHERE` with file-level stats.
  *
  * Why this matters at 100 TB: a right-to-be-forgotten request names a
  * handful of keys; rewriting the whole table for them is O(history)
  * per request. With a key-clustered layout (repartitionByRange on the
  * key at write time) the zone maps localize each key to ~1 file, so a
  * delete is O(files-containing-key) — everything else keeps its bytes
  * (and its page cache / object-store copies) untouched.
  *
  * Publish protocol (same byte-safety contract as
  * [[graft.etl.IncrementalLoad]]): replacement files are fully written
  * under `dir/.erase_staging` FIRST, together with a manifest of the
  * hit files, then each hit file is deleted and the staged files move
  * in. A concurrent reader can observe the table without some hit
  * files for a moment (never duplicated rows); a crash strands a
  * `.erase_staging` dir (dot-prefixed — invisible to readers) from
  * which [[Recovery.completeErase]] finishes the swap deterministically
  * (manifest present ⇒ staging complete ⇒ drop remaining hit files,
  * move staged files in; manifest absent ⇒ the staged write died ⇒
  * drop staging, table untouched).
  */
object TargetedDelete {

  final case class EraseStats(filesTotal: Long, filesRewritten: Long,
      rowsDeleted: Long)

  /** Hit-file manifest inside the staging dir (see erase / Recovery). */
  val manifestName = "_graft_erase_manifest"

  /** Erase all rows with `keyCol` in `keys` from the parquet table at
    * `dir`. Returns how many of the table's files were rewritten —
    * the number the layout is supposed to keep small. */
  def erase(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long]): EraseStats = {
    // Self-healing entry: a crashed previous erase may have deleted
    // hit files whose survivors still sit in staging — finish that
    // swap before scanning, or the stats pass would read a table with
    // rows missing. No-op on healthy tables.
    Recovery.completeErase(spark, dir)
    // Zone maps: production maintains these incrementally next to the
    // table; this bootstrap scan builds them in one pass (footer-only
    // with a real table format).
    val stats = DataSkipping.buildStats(spark, dir, keyCol)
      .select(col("file"), col("min_v").cast("long"), col("max_v").cast("long"))
      .collect()
    // NULL zone-map bounds = the file's key column is entirely NULL —
    // it cannot contain a tombstoned key, so it is never a hit
    val hit = stats.filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        keys.exists(k => k >= r.getLong(1) && k <= r.getLong(2)))
      .map(_.getString(0))

    if (hit.isEmpty)
      return EraseStats(stats.length.toLong, 0L, 0L)

    val fs = FileSystem.get(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir, ".erase_staging")
    fs.delete(staging, true)

    // One distributed job rewrites the union of hit files minus the
    // tombstoned keys. Key set ships as a broadcast isin (tombstone
    // lists are small by nature; a large one would become a broadcast
    // anti join on a tombstone table). The two counts are footer-only
    // (parquet count(*) pushdown) — the rewrite is the only data job.
    // NULL-safe survivor predicate: `NOT key IN (…)` is NULL for
    // NULL keys, which would silently erase every NULL-key row in a
    // hit file — rows with no key are never tombstone matches, keep them
    spark.read.parquet(hit.toIndexedSeq: _*)
      .filter(col(keyCol).isNull || !col(keyCol).isin(keys: _*))
      .write.mode("overwrite").parquet(staging.toString)
    val hitRows = spark.read.parquet(hit.toIndexedSeq: _*).count()
    val kept = spark.read.parquet(staging.toString).count()

    // Manifest of the files being replaced, written only after the
    // staged write completed: its presence certifies the staging as a
    // complete, publishable unit, and records exactly which originals
    // must go — graft.ops.Recovery.completeErase can finish the swap
    // from ANY crash point after this line.
    CertFile.write(fs, new Path(staging, manifestName), hit.mkString("\n"))

    // Swap: drop the hit files, move staged part-files in. Part-file
    // names are job-unique (UUID suffix), so no rename collides.
    hit.foreach { f => fs.delete(new Path(new java.net.URI(f)), false) }
    fs.listStatus(staging).iterator
      .filterNot(_.getPath.getName.startsWith("_"))
      .foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
    fs.delete(staging, true)

    EraseStats(stats.length.toLong, hit.length.toLong, hitRows - kept)
  }
}
