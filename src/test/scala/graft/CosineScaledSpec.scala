package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineScaled
import graft.ops.Similarity

class CosineScaledSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1f, 0f, 2f), Seq(2f, 0f, 4f)), // parallel
    (2L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)), // orthogonal
    (3L, Seq(0.5f, -0.25f, 1f), Seq(-1f, 2f, 0.125f)),
    (4L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))) // zero norm → null
    .toDF("id", "a", "b")

  test("native expression equals the composable integer-scaled path") {
    val native = vecs.select(col("id"),
      CosineScaled(col("a"), col("b")).as("c")).collect()
    val composed = vecs.select(col("id"),
      Similarity.cosineFrom(
        Similarity.intVec(col("a")), Similarity.intVec(col("b")),
        Similarity.norm2(Similarity.intVec(col("a"))).cast("double"),
        Similarity.norm2(Similarity.intVec(col("b"))).cast("double")).as("c"))
      .collect()
    assert(native.map(_.toString).toSeq == composed.map(_.toString).toSeq)
    assert(native.find(_.getLong(0) == 1L).get.getDouble(1) == 1.0)
    assert(native.find(_.getLong(0) == 4L).get.isNullAt(1))
  }

  test("interpreted eval matches codegen") {
    // interpreted path: direct Expression.eval on literal rows
    val e = graft.functions.CosineScaled(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2f, 4f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] == 1.0)
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val err = intercept[Exception] {
      bad.select(CosineScaled(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"))
  }

  test("SQL registration paths: imperative and extensions") {
    CosineScaled.register(spark.sessionState.functionRegistry)
    val r = spark.sql(
      "SELECT cosine_scaled(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(0 AS FLOAT))) AS c").first()
    assert(r.getDouble(0) == 1.0)
    // extensions entry point injects the same builder
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("bounded_topk is SQL-callable and respects the literal-k contract") {
    val (id, info, builder) = graft.functions.BoundedTopKAgg.registryEntry
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val r = spark.sql(
      "SELECT bounded_topk(v, 3) AS s FROM VALUES (5L), (1L), (4L), (2L), (9L) t(v)")
      .first()
    assert(r.getString(0) == "1,2,4")
    val err = intercept[Exception] {
      spark.sql("SELECT bounded_topk(v, v) FROM VALUES (1L) t(v)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
