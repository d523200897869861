package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Build-once STAMPED FIXTURE stores — the generalization of the
  * stored-token-table precedent ([[Bpe.storedTokens]]) to every query
  * whose "already built" state (a partitioned layout, a signature
  * index, a token table) must exist before the interesting incremental
  * path runs. In production that state is built once per dataset
  * generation and lives in storage; a benchmark that rebuilds it inside
  * the timed query measures the harness, not the operator.
  *
  * Contract:
  *  - the store is a pure function of (source data generation, declared
  *    params) — reuse can never change a query's result;
  *  - stamp = per-file (name, length, mtime) of the SOURCE dataset
  *    (directory-shaped parquet stamps every part file, so in-place
  *    regeneration that keeps the directory mtime still invalidates)
  *    plus a caller-supplied params/format token;
  *  - store dirs are keyed by a hash of the ABSOLUTE source path — two
  *    datasets sharing a basename get distinct stores instead of
  *    thrashing rebuilds;
  *  - publish is staged: build writes into `dir__staging` (same
  *    filesystem as the store — stamp and data can never land on
  *    different FSs), the stamp lands in the staging generation BEFORE
  *    the swap, and the swap is rename-aside (never delete-then-write),
  *    so a crash at any point leaves either the old complete generation
  *    or the new one — never a stampless half-written live dir. A
  *    concurrent reader mid-swap can transiently miss the dir (local
  *    bench scope); it can never read a torn generation.
  */
object Fixtures {

  /** Root directory for every fixture store, session-configurable so a
    * cluster deployment points it at durable shared FS (the Fixtures
    * production story); the local default matches the bench scope. The
    * ORACLE-side fixture ([[Bpe.dtFixturePath]]) stays at its fixed
    * path — oracle SQL is static text and must not depend on session
    * conf. */
  val rootKey = "spark.graft.fixturesDir"

  def root(s: SparkSession): String = s.conf.get(rootKey, "/tmp/graft_fixtures")

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Content stamp of a source dataset path (single file OR a directory
    * of part files): sorted per-file (name, length, mtime). */
  def datasetStamp(s: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = fsOf(s, p)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
          .map(f => s"${f.getPath.getName}:${f.getLen}:" +
            s"${f.getModificationTime}")
      else
        Array(s"${p.getName}:${st.getLen}:${st.getModificationTime}")
    files.mkString("|")
  }

  /** Short stable store-dir key from the absolute dataset path:
    * readable basename + 8-byte SHA-256 prefix of the full path. */
  def pathKey(path: String): String = {
    val abs = new java.io.File(path).getAbsolutePath
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8"))
    val hex = h.take(8).map(b => f"$b%02x").mkString
    val base = abs.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9]", "_")
    s"${base}_$hex"
  }

  /** Hex SHA-256 of arbitrary content (e.g. a merge table) for stamp
    * composition — a content change that keeps the entry count must
    * still invalidate. */
  def contentHash(content: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(content.getBytes("UTF-8")).take(16)
      .map(b => f"$b%02x").mkString

  /** Ensure the store at `storeDir` reflects `stamp`; if it already
    * does, NOTHING runs (the amortization that is the point). Otherwise
    * `build(stagingDir)` materializes the generation and the staged
    * rename-aside publish swaps it in. Returns `storeDir`.
    *
    * Concurrent builders (two JVMs racing the same missing store —
    * parallel bench sessions, a test suite beside a bench) are
    * tolerated: the store is a pure function of (source generation,
    * params), so whichever publish wins the rename is correct; a loser
    * whose swap fails re-checks the live stamp and, finding the target
    * generation already published, discards its own staging and
    * returns instead of throwing. Only a swap failure WITHOUT a
    * matching live stamp (a genuinely broken filesystem) still
    * throws. */
  def ensure(s: SparkSession, storeDir: String, stamp: String)(
      build: String => Unit): String = ensure(s, storeDir, stamp, 0)(build)

  private def ensure(s: SparkSession, storeDir: String, stamp: String,
      depth: Int)(build: String => Unit): String = {
    if (depth > 2) throw new IllegalStateException(
      s"fixture publish: lost the live slot to a stale peer generation " +
        s"$depth times at $storeDir — filesystem or peer misbehaving")
    val store = new Path(storeDir)
    val fs = fsOf(s, store)
    recover(fs, storeDir)
    if (readStamp(fs, store) != stamp) {
      // staging is unique PER ATTEMPT: a shared staging path would let
      // two concurrent builders interleave writes and publish a torn
      // generation under a valid stamp. A crashed attempt's orphan
      // staging dir is inert (never renamed in) and costs only scratch
      // space.
      val stg = new Path(storeDir + "__staging_" +
        java.util.UUID.randomUUID().toString.take(8))
      fs.delete(stg, true)
      build(stg.toString)
      val out = fs.create(new Path(stg, "_stamp"), true)
      try out.write(stamp.getBytes("UTF-8")) finally out.close()
      def lostToConcurrentWinner(): Boolean = {
        recover(fs, storeDir)
        readStamp(fs, store) == stamp && { fs.delete(stg, true); true }
      }
      // a concurrent winner may have published the target generation
      // while this attempt was building — yield instead of replacing
      // an identical live generation (stores are pure functions of the
      // stamp, so the winner's bytes are equivalent)
      if (lostToConcurrentWinner()) return storeDir
      val old = new Path(storeDir + "__old")
      fs.delete(old, true)
      if (fs.exists(store) && !fs.rename(store, old)) {
        if (!lostToConcurrentWinner())
          throw new IllegalStateException(
            s"fixture publish: cannot set aside $storeDir")
      } else if (fs.exists(store)) {
        // a stamp-CHANGING race: between this attempt's set-aside and
        // swap-in, a peer's recover() restored a stale __old into the
        // live slot (or a peer published). rename(stg, store) onto an
        // existing dir is NOT a swap — RawLocalFileSystem would nest
        // stg UNDER store — so existence here means lost-to-peer, not
        // proceed. If the live stamp isn't ours either, re-enter: the
        // restored generation is stale and the normal path (set-aside,
        // then swap) applies to it.
        if (!lostToConcurrentWinner()) {
          fs.delete(stg, true)
          return ensure(s, storeDir, stamp, depth + 1)(build)
        }
      } else if (!fs.rename(stg, store)) {
        if (fs.exists(old)) fs.rename(old, store) // roll back
        if (!lostToConcurrentWinner())
          throw new IllegalStateException(
            s"fixture publish: swap failed for $storeDir")
      } else {
        fs.delete(old, true)
      }
    }
    storeDir
  }

  /** A crash between set-aside and swap-in leaves no live dir but a
    * complete `__old` generation — restore it (idempotent). */
  private def recover(fs: FileSystem, storeDir: String): Unit = {
    val store = new Path(storeDir)
    val old = new Path(storeDir + "__old")
    if (!fs.exists(store) && fs.exists(old)) fs.rename(old, store)
  }

  private def readStamp(fs: FileSystem, store: Path): String =
    try {
      val in = fs.open(new Path(store, "_stamp"))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: Throwable => "" }
}
