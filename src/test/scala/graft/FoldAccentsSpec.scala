package graft

import org.apache.spark.sql.functions._

import graft.functions.FoldAccents

class FoldAccentsSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  test("folds combining marks, leaves non-mark letters alone") {
    val rows = Seq(
      (1L, "café naïve Zürich"),
      (2L, "ÀÉÎÕÜ mañana"),
      (3L, "øß æ đ"), // no combining marks — must pass through unchanged
      (4L, "Łódź"), // stroke is not a mark; only the acutes fold
      (5L, "plain ascii stays")).toDF("id", "s")
    val out = rows.select(col("id"), FoldAccents(col("s")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "cafe naive Zurich")
    assert(out(2L) == "AEIOU manana")
    assert(out(3L) == "øß æ đ")
    assert(out(4L) == "Łodz")
    assert(out(5L) == "plain ascii stays")
  }

  test("null in, null out; empty in, empty out") {
    val rows = Seq((1L, null: String), (2L, "")).toDF("id", "s")
    val out = rows.select(col("id"), FoldAccents(col("s")).as("f")).collect()
    assert(out.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 2L).get.getString(1) == "")
  }

  test("interpreted eval matches the dataframe (codegen) path") {
    val e = FoldAccents(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("pâté Résumé"),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == "pate Resume")
  }

  test("type check rejects non-string input") {
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(FoldAccents(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("registered in the SQL front door as fold_accents") {
    FoldAccents.register(spark.sessionState.functionRegistry)
    val got = SparkSpec.spark.sql("SELECT fold_accents('Ångström') AS f")
      .collect().head.getString(0)
    assert(got == "Angstrom")
  }
}
