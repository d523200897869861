package graft

import org.apache.spark.sql.functions._

import graft.etl.Scd2

class Scd2Spec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private val t1 = "2024-01-01 00:00:00"
  private val t2 = "2024-02-01 00:00:00"

  private lazy val b1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  test("initial batch: all rows current from batch time") {
    val v = Scd2.applyBatch(None, b1, Seq("k"), Seq("name", "bal"), t1)
    assert(v.count() == 3)
    assert(v.filter(col("is_current") && col("valid_to").isNull).count() == 3)
  }

  test("change closes old version and opens a new one; absent keys survive") {
    val v1 = Scd2.applyBatch(None, b1, Seq("k"), Seq("name", "bal"), t1)
    // key 1 changes, key 2 unchanged, key 3 ABSENT from batch, key 4 new
    val b2 = Seq((1L, "a", 99.0), (2L, "b", 20.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val v2 = Scd2.applyBatch(Some(v1), b2, Seq("k"), Seq("name", "bal"), t2)
    val rows = v2.select("k", "bal", "is_current")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(rows == Set(
      (1L, 10.0, false), (1L, 99.0, true), // closed + reopened
      (2L, 20.0, true), // unchanged rides through
      (3L, 30.0, true), // absent from batch: stays current
      (4L, 40.0, true))) // brand new key
    val closed = v2.filter(col("k") === 1 && !col("is_current")).first()
    assert(closed.getAs[java.sql.Timestamp]("valid_to").toString
      .startsWith("2024-02-01"))
  }

  test("idempotence: re-applying an identical snapshot changes nothing") {
    val v1 = Scd2.applyBatch(None, b1, Seq("k"), Seq("name", "bal"), t1)
    val v2 = Scd2.applyBatch(Some(v1), b1, Seq("k"), Seq("name", "bal"), t2)
    assertSameRows(v1, v2)
  }

  test("null attribute changes are detected null-safely (<=>)") {
    val a1 = Seq((1L, Option("x"))).toDF("k", "name")
    val a2 = Seq((1L, Option.empty[String])).toDF("k", "name")
    val v1 = Scd2.applyBatch(None, a1, Seq("k"), Seq("name"), t1)
    val v2 = Scd2.applyBatch(Some(v1), a2, Seq("k"), Seq("name"), t2)
    assert(v2.count() == 2) // x -> null is a real change
    val v3 = Scd2.applyBatch(Some(v2), a2, Seq("k"), Seq("name"),
      "2024-03-01 00:00:00")
    assert(v3.count() == 2) // null -> null is not
  }
}
