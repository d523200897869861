package graft

import org.apache.spark.sql.functions._

import graft.ops.Snapshots
import graft.tables.Catalog

class SnapshotsSpec extends SparkSuite {

  private val base = "/tmp/graft_snap/spec/orders_versions"

  private def reset(): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
  }

  test("publish assigns sequential versions and asOf reads each exactly") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    assert(Snapshots.publish(spark, base, o) == 1)
    assert(Snapshots.publish(spark, base, o.limit(10)) == 2)
    assert(Snapshots.versions(spark, base) == Seq(1, 2))
    assert(Snapshots.latestVersion(spark, base).contains(2))
    assert(Snapshots.asOf(spark, base, 1).count() == o.count())
    assert(Snapshots.asOf(spark, base, 2).count() == 10)
    // default read = current
    assert(Snapshots.asOf(spark, base).count() == 10)
  }

  test("vacuum keeps the newest N and asOf on a vacuumed version fails loudly") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    (1 to 4).foreach(_ => Snapshots.publish(spark, base, o.limit(5)))
    assert(Snapshots.vacuum(spark, base, 2) == Seq(1, 2))
    assert(Snapshots.versions(spark, base) == Seq(3, 4))
    intercept[IllegalArgumentException] {
      Snapshots.asOf(spark, base, 1)
    }
  }

  test("a lost publish race fails loudly instead of nesting invisibly") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    Snapshots.publish(spark, base, o.limit(3))
    // two publishers both listed {v=1} and computed next=2; the winner
    // commits v=2 first — the loser's rename into the EXISTING dir
    // would nest its staging inside (Hadoop semantics) and vanish
    // silently
    assert(Snapshots.publishAs(spark, base, o.limit(3), 2) == 2)
    intercept[IllegalArgumentException] {
      Snapshots.publishAs(spark, base, o.limit(7), 2)
    }
    // the winner's data is untouched and still the current version
    assert(Snapshots.versions(spark, base) == Seq(1, 2))
    assert(Snapshots.asOf(spark, base, 2).count() == 3)
  }

  test("a race lost INSIDE the check-then-act window is caught post-rename") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    Snapshots.publish(spark, base, o.limit(3)) // v=1
    Snapshots.publish(spark, base, o.limit(3)) // v=2, the race winner
    // Simulate the loser whose exists() check passed BEFORE the winner
    // renamed: its rename into the now-existing v=2 nests the staging
    // (Hadoop semantics). Reproduce that end state directly, then run
    // the post-rename commit test.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(base, "v=2")
    fs.mkdirs(new org.apache.hadoop.fs.Path(dest, ".v=2__staging__loser"))
    intercept[IllegalStateException] {
      Snapshots.verifyCommit(fs, dest, ".v=2__staging__loser", 2)
    }
    // the loser's nested data was withdrawn; the winner's is intact
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dest, ".v=2__staging__loser")))
    assert(Snapshots.asOf(spark, base, 2).count() == 3)
  }

  test("unique staging names keep racing verifiers from swapping outcomes") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    Snapshots.publish(spark, base, o.limit(3)) // v=1
    // Both racers computed next=2. The winner renames in first; the
    // loser's rename nests its OWN staging under dest before the
    // winner runs verifyCommit. With a shared staging name the winner
    // would see the loser's nested dir, withdraw it, and mis-report
    // "lost race"; with unique names each verifier probes only its
    // own dir, so outcomes cannot swap.
    Snapshots.publishAs(spark, base, o.limit(3), 2, attemptId = "winner")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(base, "v=2")
    fs.mkdirs(new org.apache.hadoop.fs.Path(dest, ".v=2__staging__loser"))
    // winner's verify: succeeds, does NOT touch the loser's nested dir
    Snapshots.verifyCommit(fs, dest, ".v=2__staging__winner", 2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dest, ".v=2__staging__loser")))
    // loser's verify: finds its own nested dir, withdraws it, throws
    intercept[IllegalStateException] {
      Snapshots.verifyCommit(fs, dest, ".v=2__staging__loser", 2)
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dest, ".v=2__staging__loser")))
    assert(Snapshots.asOf(spark, base, 2).count() == 3)
  }

  test("a stranded staging dir is invisible to readers and swept by vacuum") {
    reset()
    val o = Catalog.orders(spark, sf).select(col("o_orderkey"))
    Snapshots.publish(spark, base, o.limit(3))
    // simulate a crash mid-publish: staging exists, rename never happened
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(base, ".v=2__staging__crashed"))
    assert(Snapshots.versions(spark, base) == Seq(1))
    assert(Snapshots.asOf(spark, base).count() == 3)
    // retry publishes v=2 cleanly alongside the stranded staging
    assert(Snapshots.publish(spark, base, o.limit(7)) == 2)
    assert(Snapshots.asOf(spark, base, 2).count() == 7)
    // v=2 committed, so the stranded v=2 staging can never rename in;
    // vacuum sweeps it even when no versions are dropped
    assert(fs.exists(new org.apache.hadoop.fs.Path(base, ".v=2__staging__crashed")))
    assert(Snapshots.vacuum(spark, base, 2) == Seq.empty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, ".v=2__staging__crashed")))
  }
}
