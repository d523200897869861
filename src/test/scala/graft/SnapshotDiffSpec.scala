package graft

import org.apache.spark.sql.functions._

import graft.ops.SnapshotDiff
import graft.tables.Catalog

class SnapshotDiffSpec extends SparkSuite {

  test("diff classifies inserts, deletes, updates; drops unchanged; round-trips via merge") {
    val base = Catalog.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"),
        round(col("s_acctbal") * 100).cast("bigint").as("bal_cents"))
    val oldSnap = base.filter(col("s_suppkey") % 5 =!= 0) // %5==0 absent → I
    val newSnap = base.filter(col("s_suppkey") % 7 =!= 0) // %7==0 absent → D
      .withColumn("bal_cents",
        when(col("s_suppkey") % 3 === 0, col("bal_cents") + 1L)
          .otherwise(col("bal_cents")))

    val d = SnapshotDiff.diff(oldSnap, newSnap,
      Seq("s_suppkey"), Seq("s_name", "bal_cents")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    base.select(col("s_suppkey")).collect().map(_.getLong(0)).foreach { k =>
      val inOld = k % 5 != 0
      val inNew = k % 7 != 0
      val expected =
        if (k % 5 == 0 && inNew) Some("I")
        else if (inOld && !inNew) Some("D")
        else if (inOld && inNew && k % 3 == 0) Some("U")
        else None
      assert(d.get(k) == expected, s"key $k: got ${d.get(k)}, want $expected")
    }
  }

  test("null-to-value and value-to-null transitions are updates, not no-ops") {
    import SparkSpec.spark.implicits._
    val oldSnap = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("k", "v")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option("b")),
      (3L, Option("c"))).toDF("k", "v")
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "U", 2L -> "U")) // 3 unchanged → absent
  }
}
