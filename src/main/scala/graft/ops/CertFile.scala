package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny certification files for the publish protocols (the incremental
  * marker, the erase manifest): one writer, one reader, shared by every
  * protocol so the IO quirks (full-read via getLen, UTF-8, overwrite)
  * live in exactly one place. A cert file is always written AFTER the
  * staged data completed — its presence is the completeness proof
  * [[Recovery]] decides on. */
private[graft] object CertFile {

  def write(fs: FileSystem, file: Path, content: String): Unit = {
    val out = fs.create(file, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def read(fs: FileSystem, file: Path): Option[String] = {
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(file).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8"))
      } finally in.close()
    }
  }
}
