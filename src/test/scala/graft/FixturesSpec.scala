package graft

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._

import graft.ops.Fixtures

/** The stamped build-once fixture store ([[graft.ops.Fixtures]]): the
  * generalization of the stored-token-table precedent that moves
  * q94/q96's "already built" state (day-partitioned layout, history
  * signature index) out of the timed query. Pins: build-once semantics,
  * per-file staleness, atomic rename-aside publish with crash recovery,
  * and — the round-10 point — that a SECOND run of q94/q96 writes
  * NOTHING into its store.
  */
class FixturesSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_fixtures_spec/$tag"
    val p = Paths.get(d)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[JPath]())
        .forEach(f => Files.delete(f))
    d
  }

  test("store root follows the session conf (cluster deployments " +
      "point it at durable shared FS)") {
    val alt = freshDir("confroot")
    val prev = spark.conf.getOption(Fixtures.rootKey)
    spark.conf.set(Fixtures.rootKey, alt)
    try {
      assert(Fixtures.root(spark) == alt)
      val store = s"${Fixtures.root(spark)}/probe"
      Fixtures.ensure(spark, store, "v1") { stg =>
        Files.createDirectories(Paths.get(stg))
        Files.writeString(Paths.get(stg, "data.txt"), "x")
      }
      assert(Files.exists(Paths.get(s"$alt/probe/data.txt")),
        "the store must land under the configured root")
    } finally prev match {
      case Some(v) => spark.conf.set(Fixtures.rootKey, v)
      case None => spark.conf.unset(Fixtures.rootKey)
    }
    assert(Fixtures.root(spark) == "/tmp/graft_fixtures",
      "default root when the conf is unset")
  }

  test("ensure builds once per stamp, rebuilds only on stamp change") {
    val dir = freshDir("once")
    var builds = 0
    def build(stg: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(stg))
      Files.writeString(Paths.get(stg, "data.txt"), s"gen$builds")
    }
    Fixtures.ensure(spark, s"$dir/store", "v1")(build)
    Fixtures.ensure(spark, s"$dir/store", "v1")(build)
    assert(builds == 1, "same stamp must not rebuild")
    assert(Files.readString(Paths.get(s"$dir/store/data.txt")) == "gen1")
    Fixtures.ensure(spark, s"$dir/store", "v2")(build)
    assert(builds == 2, "a stamp change must rebuild")
    assert(Files.readString(Paths.get(s"$dir/store/data.txt")) == "gen2")
    // no staging/aside leftovers after a clean publish (staging dirs
    // are per-attempt "store__staging_<uuid>")
    val leftovers = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.contains("__staging") || n.contains("__old"))
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.toSeq}")
  }

  test("a concurrent winner's publish is tolerated, not an error") {
    val dir = freshDir("race")
    // builder A stages gen v1; before A's swap-in, builder B (the
    // winner) publishes the SAME generation — simulated by publishing
    // v1 from inside A's build callback, after A's staging is written
    def publish(content: String): Unit =
      Fixtures.ensure(spark, s"$dir/store", "v1") { stg =>
        Files.createDirectories(Paths.get(stg))
        Files.writeString(Paths.get(stg, "data.txt"), content)
      }
    var raced = false
    Fixtures.ensure(spark, s"$dir/store", "v1") { stg =>
      Files.createDirectories(Paths.get(stg))
      Files.writeString(Paths.get(stg, "data.txt"), "from-A")
      publish("from-B") // B wins while A is still staging
      raced = true
    }
    assert(raced)
    // A must detect B's identical published generation and yield —
    // the store is intact, stamped, and has exactly one generation
    assert(Files.readString(Paths.get(s"$dir/store/data.txt")) == "from-B")
    assert(Files.readString(Paths.get(s"$dir/store/_stamp")) == "v1")
    val leftovers = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.contains("__staging") || n.contains("__old"))
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.toSeq}")
  }

  test("datasetStamp covers every part file of a directory dataset") {
    val dir = freshDir("stamp")
    val ds = Paths.get(s"$dir/ds.parquet")
    Files.createDirectories(ds)
    Files.writeString(ds.resolve("part-0"), "aaaa")
    Files.writeString(ds.resolve("part-1"), "bbbb")
    val s1 = Fixtures.datasetStamp(spark, ds.toString)
    assert(s1.contains("part-0") && s1.contains("part-1"))
    // in-place regeneration of ONE part file (same size, new mtime)
    // must change the stamp — the blind spot of dir-level (len, mtime)
    Files.writeString(ds.resolve("part-1"), "cccc")
    ds.resolve("part-1").toFile.setLastModified(
      System.currentTimeMillis() + 5000)
    assert(Fixtures.datasetStamp(spark, ds.toString) != s1)
  }

  test("a crash between set-aside and swap-in self-heals on next ensure") {
    val dir = freshDir("crash")
    Fixtures.ensure(spark, s"$dir/store", "v1") { stg =>
      Files.createDirectories(Paths.get(stg))
      Files.writeString(Paths.get(stg, "data.txt"), "live")
    }
    // simulate the crash window: live renamed aside, swap-in never ran
    Files.move(Paths.get(s"$dir/store"), Paths.get(s"$dir/store__old"))
    var rebuilt = false
    Fixtures.ensure(spark, s"$dir/store", "v1") { _ => rebuilt = true }
    assert(!rebuilt, "recovery must restore the aside generation, not rebuild")
    assert(Files.readString(Paths.get(s"$dir/store/data.txt")) == "live")
  }

  test("pathKey distinguishes same-basename datasets") {
    val a = Fixtures.pathKey("/data/run_a/sf0.01")
    val b = Fixtures.pathKey("/data/run_b/sf0.01")
    assert(a != b)
    assert(a.startsWith("sf0_01_") && b.startsWith("sf0_01_"))
  }

  private def snapshotTree(root: String): Map[String, Long] = {
    val p = Paths.get(root)
    assert(Files.exists(p), s"store $root should exist after a run")
    val it = Files.walk(p).iterator()
    var m = Map.empty[String, Long]
    while (it.hasNext) {
      val f = it.next()
      if (Files.isRegularFile(f))
        m += (f.toString -> Files.getLastModifiedTime(f).toMillis)
    }
    m
  }

  test("q94's second run reuses the day-partitioned store untouched") {
    val store =
      s"${Fixtures.root(spark)}/dpp_${Fixtures.pathKey(sf)}/events_by_day"
    val q = graft.queries.LoadQueries.q94
    val n1 = q.run(spark, sf).count()
    val before = snapshotTree(store)
    val n2 = q.run(spark, sf).count()
    assert(n1 == n2 && n1 > 0)
    assert(snapshotTree(store) == before,
      "the timed q94 path must be the DPP probe only — no layout writes")
  }

  test("q96's second run reuses the history signature index untouched") {
    val store = s"${Fixtures.root(spark)}/dedup_index_${Fixtures.pathKey(sf)}"
    val q = graft.queries.DedupQueries.q96
    val n1 = q.run(spark, sf).count()
    val before = snapshotTree(store)
    val n2 = q.run(spark, sf).count()
    assert(n1 == n2 && n1 > 0)
    assert(snapshotTree(store) == before,
      "the timed q96 path must be sign-delta + band-join only — no index writes")
  }
}
