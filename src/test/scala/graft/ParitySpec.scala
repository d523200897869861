package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl.Forex
import graft.ops.{Functions, Normalize}
import graft.queries.Parity

class NormalizeSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private lazy val messy = Seq(
    (1, "A", Some(10.0), "x"), (1, "A", Some(10.0), "x"),
    (2, null, None, "y"), (3, "C", Some(0.0), null))
    .toDF("ID", "Name", "AMOUNT", "Region")

  test("P1 lowercase rename is metadata-only and idempotent") {
    val once = Normalize.lowercaseColumns(messy)
    assert(once.columns.toSeq == Seq("id", "name", "amount", "region"))
    assert(Normalize.lowercaseColumns(once).columns.toSeq == once.columns.toSeq)
  }

  test("P2 fillna: numeric → 0, string → \"0\" (SURVEY §7.4.1)") {
    val filled = Normalize.fillNulls(messy).collect()
    assert(filled.forall(r => !r.anyNull))
    assert(filled.exists(r => r.getString(1) == "0"))
    assert(filled.exists(r => r.getString(3) == "0"))
  }

  test("D1/A5 dedup removes exact dupes; dedup is idempotent") {
    assert(Normalize.duplicateCount(messy) == 1)
    val d = Normalize.dedup(messy)
    assert(d.count() == 3)
    assert(Normalize.dedup(d).count() == 3)
    val viaDF = Normalize.duplicateCountDF(messy).first().getLong(0)
    assert(viaDF == 1)
  }

  test("file-1 pipeline end-to-end") {
    val out = Normalize.run(messy)
    assert(out.count() == 3)
    assert(out.columns.forall(c => c == c.toLowerCase))
  }
}

class FunctionsSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  test("F4 safeDivide: NULL on zero or NULL divisor, never throws") {
    val df = Seq((10.0, 2.0), (1.0, 0.0)).toDF("a", "b")
      .select(Functions.safeDivide(col("a"), col("b")).as("q"))
    assert(df.collect().toSeq == Seq(Row(5.0), Row(null)))
  }

  test("null-tolerant join predicate keeps null keys (ref sql:106-109)") {
    val df = Seq((Some(1), 1), (None, 1), (Some(2), 1)).toDF("x", "y")
      .filter(Functions.nullTolerantEq(col("x"), col("y")))
    assert(df.count() == 2)
  }

  test("J14 status-name regex normalization strips digits and parens") {
    val df = Seq("Shipped(2)", "SHIPPED 01", "cancelled").toDF("s")
      .select(Functions.statusNameNormalize(col("s")).as("n"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("SHIPPED", "SHIPPED ", "CANCELLED"))
  }

  test("A2 latestBy picks exactly one latest row per key") {
    val df = Seq(("EUR", 2024, 12, 1.1), ("EUR", 2025, 1, 1.2), ("EUR", 2025, 3, 1.25),
      ("GBP", 2025, 3, 0.8), ("JPY", 2024, 6, 150.0))
      .toDF("cur", "y", "m", "rate")
    val latest = Functions.latestBy(df, Seq("cur"),
      Seq(col("y").desc, col("m").desc))
      .select("cur", "rate").as[(String, Double)].collect().toMap
    assert(latest == Map("EUR" -> 1.25, "GBP" -> 0.8, "JPY" -> 150.0))
  }

  test("F10 two-digit year quirk preserved verbatim") {
    val df = Seq("2025-03-01").toDF("d")
      .select(Functions.twoDigitYear(to_date(col("d"))).as("y"))
    assert(df.first().getString(0) == "25")
  }
}

class ForexSpec extends SparkSuite {
  test("CTE-faithful and window argmax variants agree (A2)") {
    assertSameRows(Forex.latestCte(spark, sf), Forex.latestWindow(spark, sf))
  }

  test("latest picks max (year, month) per currency") {
    val rows = Forex.latestWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCur = Forex.base(spark, sf).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val cur = r.getString(0)
      val best = byCur(cur).map(x => (x.getInt(1), x.getInt(2))).max
      assert((r.getInt(1), r.getInt(2)) == best)
    }
  }
}

class ParityQueriesSpec extends SparkSuite {
  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.registry.foreach { q =>
      val n = q.run(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
