package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.etl.IncrementalLoad

/** CRASH RECOVERY for the engine's publish protocols. Every mutating
  * protocol here follows the same discipline: stage completely, write
  * a marker/manifest that certifies completeness, then swap with
  * renames — so after a crash the on-disk state is machine-decidable:
  *
  *  - marker/manifest PRESENT → the staging is a complete publishable
  *    unit → re-run the (idempotent) publish tail to roll FORWARD;
  *  - ABSENT → the staged write itself died → drop the staging and the
  *    table is untouched (rolled BACK).
  *
  * All three recoveries are idempotent — safe to run on healthy
  * tables, after repeated crashes, or mid-recovery-crash. Each returns
  * a human-readable action log (empty = nothing to repair).
  */
object Recovery {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Repair an [[graft.etl.IncrementalLoad]] target after a crash
    * anywhere in its publish. Handles, in order: stranded per-partition
    * `.P.retire` dirs (restore only when neither the target partition
    * nor its staged replacement survives — staged data wins otherwise),
    * a stranded `__retired` full snapshot (restore only if the target
    * is gone), and a `__staging` dir (re-run the recorded publish tail
    * if its marker certifies completeness; drop it otherwise). */
  def recoverIncrementalTarget(spark: SparkSession,
      targetPath: String): Seq[String] = {
    val fs = fsFor(spark, targetPath)
    val targetP = new Path(targetPath)
    val staging = new Path(targetPath + "__staging")
    val retired = new Path(targetPath + "__retired")
    val log = scala.collection.mutable.ArrayBuffer.empty[String]

    val marker =
      if (fs.exists(staging)) IncrementalLoad.readMarker(fs, staging)
      else None
    val stagedParts: Set[String] = marker match {
      case Some(m) if m.startsWith("DELTA") => m.split("\n").drop(1).toSet
      case _ => Set.empty
    }

    // 1. Per-partition retire dirs from a crashed delta swap. The swap
    //    order (retire dest, move staged in, drop retire) means: if the
    //    destination exists the swap completed — drop the retire; if a
    //    CERTIFIED staging still holds the replacement the re-publish
    //    below will land it — drop the retire; otherwise the retire is
    //    the last copy — restore it. The certification check matters:
    //    a MARKERLESS staging containing the partition is an
    //    incomplete write that step 3 will delete, so treating it as a
    //    replacement would drop the partition's only surviving copy.
    if (fs.exists(targetP)) fs.listStatus(targetP).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".") && n.endsWith(".retire")) {
        val part = n.stripPrefix(".").stripSuffix(".retire")
        val dest = new Path(targetP, part)
        val stagedSrc = new Path(staging, part)
        if (fs.exists(dest) ||
            (marker.isDefined && fs.exists(stagedSrc))) {
          fs.delete(st.getPath, true)
          log += s"dropped superseded retire $n"
        } else {
          fs.rename(st.getPath, dest)
          log += s"restored $part from retire"
        }
      }
    }

    // 2. Stranded full-snapshot retire: the FULL publish renames the
    //    old target aside before promoting staging; if the promote
    //    never happened AND no complete staging can supply the new
    //    snapshot, the retired copy is the table — restore it.
    if (fs.exists(retired)) {
      // only a complete FULL staging supersedes the retired snapshot —
      // a DELTA staging holds lookback partitions, not the table
      if (!fs.exists(targetP) && !marker.exists(_.startsWith("FULL"))) {
        fs.rename(retired, targetP)
        log += "restored target from __retired"
      } else {
        fs.delete(retired, true)
        log += "dropped superseded __retired"
      }
    }

    // 3. Staging: roll forward (complete) or back (incomplete).
    if (fs.exists(staging)) marker match {
      case Some(m) if m.startsWith("FULL") =>
        IncrementalLoad.publishFull(fs, targetP, staging)
        log += "re-ran FULL publish from staging"
      case Some(m) if m.startsWith("DELTA") =>
        val offsetDayStr = m.split("\n").head.stripPrefix("DELTA ").trim
        IncrementalLoad.publishDelta(fs, targetP, staging, offsetDayStr,
          stagedParts)
        log += s"re-ran DELTA publish from staging (offset $offsetDayStr)"
      case _ =>
        fs.delete(staging, true)
        log += "dropped incomplete __staging (no marker)"
    }

    // 4. A crash between the FULL publish's staging→target rename and
    //    its marker delete strands the marker INSIDE the target (the
    //    rename carried it along; staging is gone so no step above
    //    looks at it). Benign to readers (underscore-prefixed) but not
    //    byte-clean — finish the interrupted delete here.
    if (!fs.exists(staging)) {
      val strandedMarker = new Path(targetP, IncrementalLoad.markerName)
      if (fs.exists(strandedMarker)) {
        fs.delete(strandedMarker, false)
        log += "dropped stale publish marker inside target"
      }
    }
    log.toSeq
  }

  /** Finish a crashed [[TargetedDelete.erase]]: with a manifest the
    * staging is complete — drop any manifest-listed original still
    * present and move the remaining staged files in; without one the
    * staged write died — drop the staging, the table is untouched. */
  def completeErase(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsFor(spark, dir)
    val staging = new Path(dir, ".erase_staging")
    if (!fs.exists(staging)) return Seq.empty
    val manifest = new Path(staging, TargetedDelete.manifestName)
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    CertFile.read(fs, manifest) match {
      case None =>
        fs.delete(staging, true)
        log += "dropped incomplete .erase_staging (no manifest)"
      case Some(m) =>
        val hit = m.split("\n").filter(_.nonEmpty)
        hit.foreach { f =>
          val p = new Path(new java.net.URI(f))
          if (fs.exists(p)) {
            fs.delete(p, false)
            log += s"dropped hit file ${p.getName}"
          }
        }
        fs.listStatus(staging).iterator
          // "_" = manifest/markers; "." = CertFile temp from a crashed
          // atomic write — neither is staged data
          .filterNot(f => f.getPath.getName.startsWith("_") ||
            f.getPath.getName.startsWith("."))
          .foreach { f =>
            fs.rename(f.getPath, new Path(dir, f.getPath.getName))
            log += s"moved in staged ${f.getPath.getName}"
          }
        fs.delete(staging, true)
        log += "completed erase from staging"
    }
    log.toSeq
  }

  /** Drop stranded [[Snapshots]] staging dirs
    * (`.v=N__staging__<attempt>`): a snapshot publish commits with ONE
    * rename, so any surviving staging dir means that attempt's commit
    * never happened — either the version does not exist (crash before
    * rename) or another attempt won it — and the staged bytes are
    * garbage by definition. */
  def cleanSnapshotStaging(spark: SparkSession, base: String): Seq[String] = {
    val fs = fsFor(spark, base)
    val p = new Path(base)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).iterator
      .filter(st => st.getPath.getName.matches("\\.v=\\d+__staging.*"))
      .map { st =>
        fs.delete(st.getPath, true)
        s"dropped stranded ${st.getPath.getName}"
      }.toSeq
  }
}
