package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational sibling of the incremental
  * publish. Long-lived ingest targets accumulate files (one per
  * micro-batch / per task of every partition overwrite); readers then
  * pay per-file open + footer parse costs that dwarf the data at 100 TB
  * directory scales. Compaction rewrites a parquet directory into
  * ~`targetBytes` files through a staged write + rename promote — the
  * same publish discipline as [[graft.etl.IncrementalLoad]]: a reader
  * sees the old files or the new, never a mix.
  *
  * `repartition(n)` (round-robin shuffle) rather than `coalesce(n)`:
  * coalesce would skip the shuffle but glues input splits together
  * as-is, inheriting any skew in the small files — balanced output
  * files are the point of compacting.
  *
  * Publish discipline: staged write, then rename the old dir ASIDE
  * (`__retired`), rename the staged dir in, drop the retired dir. No
  * crash point loses data — the rows always live under exactly one of
  * `path`, `path__retired`, or `path__compact` — but the publish is
  * NOT atomic: between the two renames a reader sees `path` missing
  * (recovery: promote `__compact` if complete, else restore
  * `__retired`).
  */
object Compact {

  /** FileSystem of `path`'s own scheme — never the default FS. */
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Bytes of parquet under `path` (recursive). */
  def parquetBytes(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val it = fs.listFiles(new Path(path), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet dir at `path` into ⌈bytes/targetBytes⌉
    * balanced files; returns the file count written.
    *
    * `clusterBy` = the Delta `OPTIMIZE … ZORDER BY` analog: instead of
    * round-robin balancing, the rewrite range-partitions AND sorts on
    * the given columns, so every output file owns a tight value range —
    * restoring the layout [[DataSkipping]]'s zone maps and
    * [[TargetedDelete]]'s file pruning depend on after appends have
    * interleaved the key space. Same file-count contract, one extra
    * sort inside each output task. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Int = {
    val parts = math.max(1L,
      (parquetBytes(spark, path) + targetBytes - 1) / targetBytes).toInt
    val fs = fsFor(spark, path)
    val staged = new Path(path + "__compact")
    fs.delete(staged, true)
    val src = spark.read.parquet(path)
    val arranged =
      if (clusterBy.isEmpty) src.repartition(parts)
      else src.repartitionByRange(parts,
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(clusterBy.head, clusterBy.tail: _*)
    arranged.write.parquet(staged.toString)
    val target = new Path(path)
    val retired = new Path(path + "__retired")
    fs.delete(retired, true)
    fs.rename(target, retired)
    fs.rename(staged, target)
    fs.delete(retired, true)
    parts
  }

  /** SELECTIVE compaction — rewrite ONLY files smaller than
    * `smallBytes`, leaving every already-right-sized file's bytes (and
    * page-cache / object-store copies) untouched. This is the shape
    * that matters at 100 TB: a long-lived ingest target is mostly
    * full-size files plus a small-file tail from recent micro-batches;
    * [[compact]]'s whole-table rewrite is O(history) per invocation,
    * while this is O(tail) — the Delta/Iceberg `OPTIMIZE` semantics
    * (bin-pack the small files, skip compacted ones).
    *
    * Publish protocol: IDENTICAL to [[TargetedDelete.erase]]'s
    * file-level surgery, deliberately — staged replacement files land
    * under `dir/.erase_staging` first, a manifest of the originals
    * certifies completeness, then originals drop and staged files move
    * in. One shared protocol means ONE recovery procedure:
    * [[Recovery.completeErase]] finishes a crashed compaction exactly
    * as it finishes a crashed erase (manifest ⇒ roll forward; no
    * manifest ⇒ roll back, table untouched). CompactSpec crash-drills
    * both states.
    *
    * Partitioned/nested layouts: each non-hidden subdirectory (a
    * `k=v` partition dir, or deeper nesting) is its own flat parquet
    * unit and is compacted INDEPENDENTLY by recursion — per-leaf
    * staging, per-leaf recovery, rewritten files stay inside their
    * partition. A mixed directory (loose files AND subdirs) handles
    * both. Nothing is silently skipped.
    *
    * Returns the number of files written (0 = nothing worth
    * compacting: fewer than `minSmalls` small files anywhere). */
  def compactSmall(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      smallBytes: Long = 32L << 20,
      clusterBy: Seq[String] = Nil,
      minSmalls: Int = 2): Int = {
    Recovery.completeErase(spark, path)
    val fs = fsFor(spark, path)
    val entries = fs.listStatus(new Path(path))
    val fromLeaves = entries.iterator
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(s => compactSmall(spark, s.getPath.toString, targetBytes,
        smallBytes, clusterBy, minSmalls))
      .sum
    val files = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val smalls = files.filter(_.getLen < smallBytes)
    if (smalls.length < minSmalls) return fromLeaves
    val bytes = smalls.map(_.getLen).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staging = new Path(path, ".erase_staging")
    fs.delete(staging, true)
    val src = spark.read.parquet(
      smalls.map(_.getPath.toString).toIndexedSeq: _*)
    val arranged =
      if (clusterBy.isEmpty) src.repartition(parts)
      else src.repartitionByRange(parts,
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(clusterBy.head, clusterBy.tail: _*)
    arranged.write.parquet(staging.toString)
    // manifest AFTER the staged write: its presence certifies the
    // staging as complete and names exactly which originals must go
    CertFile.write(fs, new Path(staging, TargetedDelete.manifestName),
      smalls.map(_.getPath.toString).mkString("\n"))
    smalls.foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(staging).iterator
      .filterNot(f => f.getPath.getName.startsWith("_") ||
        f.getPath.getName.startsWith("."))
      .foreach(f => fs.rename(f.getPath, new Path(path, f.getPath.getName)))
    fs.delete(staging, true)
    fromLeaves + parts
  }
}
