package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny certification files for the publish protocols (the incremental
  * marker, the erase manifest): one writer, one reader, shared by every
  * protocol so the IO quirks (full-read via getLen, UTF-8, overwrite)
  * live in exactly one place. A cert file is always written AFTER the
  * staged data completed — its presence is the completeness proof
  * [[Recovery]] decides on.
  *
  * Because PRESENCE is the proof, the write itself must be atomic: a
  * crash mid-`write` must never leave a torn-but-present file (a DELTA
  * marker truncated after its first line would make recovery roll
  * FORWARD with an incomplete partition set — data loss). Two guards,
  * either sufficient alone:
  *  - the content is committed by RENAME (write to a dot-prefixed temp
  *    sibling, hflush, rename into place — the same commit primitive as
  *    every other publish step here);
  *  - the content carries a terminator line; [[read]] validates it and
  *    treats a file without it as ABSENT, so even on a store with
  *    non-atomic rename a torn file demotes to "no cert" (rollback),
  *    never to "complete cert with missing entries".
  *
  * FORMAT BREAK: terminator validation means cert files written by the
  * pre-terminator format read as absent — a staging certified under the
  * old format would demote to rollback on first recovery after upgrade.
  * Acceptable here because certs live only in regenerated scratch dirs;
  * a deployment with durable old-format markers must re-certify (rerun
  * the publish) before upgrading, or temporarily accept terminator-less
  * files during a migration window. Note also the delete-then-rename in
  * [[write]] opens a brief no-cert window when OVERWRITING an existing
  * cert — safe for our one-shot certs (never overwritten after publish),
  * load-bearing to fix if that ever changes.
  */
private[graft] object CertFile {

  /** Last line of every cert file; never part of the payload. */
  private val Terminator = "#GRAFT_CERT_END"

  def write(fs: FileSystem, file: Path, content: String): Unit = {
    val tmp = new Path(file.getParent, "." + file.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((content + "\n" + Terminator).getBytes("UTF-8"))
    finally out.close()
    fs.delete(file, false) // rename-over is not portable; clear first
    require(fs.rename(tmp, file), s"cert commit rename failed for $file")
  }

  /** Returns the payload, or None when the file is absent OR torn
    * (missing terminator) — callers treat both as "not certified". */
  def read(fs: FileSystem, file: Path): Option[String] = {
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(file).getLen.toInt)
        in.readFully(bytes)
        val raw = new String(bytes, "UTF-8")
        if (raw.endsWith("\n" + Terminator)) {
          Some(raw.dropRight(Terminator.length + 1))
        } else None
      } finally in.close()
    }
  }
}
