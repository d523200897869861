package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BandedEditDistance

/** The banded edit-distance expression vs a reference full DP: exact
  * agreement (capped at k+1) over exhaustive small cases and random
  * ASCII strings, the non-ASCII fallback, and plan-level parity with
  * the builtin on the real q44 pair set. */
class EditDistanceSpec extends SparkSuite {

  private def ref(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    val d = Array.tabulate(n + 1, m + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(n)(m)
  }

  private def got(a: String, b: String, k: Int): Int =
    BandedEditDistance.dist(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("exhaustive small alphabet: banded == capped reference") {
    val alpha = Seq("", "a", "b", "ab", "ba", "aab", "abb", "aba", "bab",
      "abab", "baba", "aabb", "abba")
    for (a <- alpha; b <- alpha; k <- 0 to 3) {
      val expect = math.min(ref(a, b), k + 1)
      assert(got(a, b, k) == expect,
        s"dist('$a','$b',$k): got ${got(a, b, k)}, want $expect")
    }
  }

  test("random ASCII strings agree with the reference at k=2") {
    val rnd = new scala.util.Random(421)
    for (_ <- 1 to 3000) {
      val a = (1 to rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to rnd.nextInt(14)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val expect = math.min(ref(a, b), 3)
      assert(got(a, b, 2) == expect, s"dist('$a','$b',2)")
    }
  }

  test("customer-name shape and non-ASCII fallback") {
    assert(got("Customer#000000001", "Customer#000000001", 2) == 0)
    assert(got("Customer#000000001", "Customer#000000002", 2) == 1)
    assert(got("Customer#000000019", "Customer#000000091", 2) == 2)
    assert(got("Customer#000000123", "Customer#000000456", 2) == 3) // capped
    // non-ASCII goes through the UTF8String fallback — char semantics
    assert(got("café", "cafe", 2) == 1)
    assert(got("ééé", "eee", 2) == 3) // capped at k+1
  }

  test("q44's pair set: expression matches the builtin exactly") {
    val c = graft.tables.Catalog.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
    val pairs = c.as("a").join(c.as("b"),
      col("a.c_nationkey") === col("b.c_nationkey") &&
        col("a.c_mktsegment") === col("b.c_mktsegment") &&
        col("a.c_custkey") < col("b.c_custkey"))
    val diff = pairs.select(
        BandedEditDistance(col("a.c_name"), col("b.c_name"), 2).as("fast"),
        levenshtein(col("a.c_name"), col("b.c_name"), 2).as("builtin"))
      // builtin returns -1 above threshold; ours returns k+1
      .withColumn("builtin_c",
        when(col("builtin") < 0 || col("builtin") > 2, 3)
          .otherwise(col("builtin")))
      .filter(col("fast") =!= col("builtin_c"))
    assert(diff.count() == 0)
  }
}
