package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped scratch root for ephemeral protocol state (streaming
  * checkpoints, staged stream sources, per-run ledgers). Default is
  * `/tmp`; [[graft.Bench]] points it at a RAM-backed dir when one
  * exists, because a LOCAL-MODE benchmark's checkpoint fsyncs measure
  * the box's disk, not the operator — on a real cluster this role is
  * played by node-local SSD scratch while durable checkpoints go to
  * the cluster FS, a deployment choice orthogonal to the dataflow
  * being timed. Correctness runs ([[graft.Verify]], tests) keep the
  * disk-backed default: they exercise the durable-checkpoint code
  * path, including crash-recovery semantics.
  */
object Scratch {
  val confKey = "spark.graft.scratchDir"

  def dir(s: SparkSession): String = s.conf.get(confKey, "/tmp")

  /** A RAM-backed scratch root if the platform has one, else /tmp. */
  def fastScratch(): String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_scratch" else "/tmp"
  }

  /** A PER-PROCESS scratch dir under [[fastScratch]], with dead-owner
    * reaping: RAM scratch is never reaped by the OS between runs, so
    * crashed sessions would accumulate in tmpfs — but a recursive wipe
    * of the shared root (the previous bound) deletes a CONCURRENT
    * session's live checkpoints mid-query (bench beside StageProbe on
    * this shared box). Instead each session owns `p<pid>/`, wipes only
    * its own leftover (pid reuse), and reaps siblings whose owning
    * process is gone (`/proc/<pid>` absent). Non-conforming entries
    * (the pre-scoping layout) are reaped too. Where `/proc` is
    * unavailable the reap degrades to own-dir-only — strictly safer,
    * slightly laxer bound. */
  def sessionScratch(): String = {
    val root = fastScratch()
    if (root == "/tmp") return "/tmp"
    val rootF = new java.io.File(root)
    rootF.mkdirs()
    val procFs = new java.io.File("/proc").isDirectory
    def ownerAlive(name: String): Boolean = {
      val pid = name.stripPrefix("p")
      name.startsWith("p") && pid.nonEmpty && pid.forall(_.isDigit) &&
        (!procFs || new java.io.File(s"/proc/$pid").exists())
    }
    Option(rootF.listFiles()).getOrElse(Array.empty)
      .filterNot(f => ownerAlive(f.getName))
      .foreach { f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: Throwable => () }
      }
    val mine = new java.io.File(rootF,
      s"p${ProcessHandle.current().pid()}")
    try org.apache.commons.io.FileUtils.deleteDirectory(mine)
    catch { case _: Throwable => () }
    mine.toString
  }
}
