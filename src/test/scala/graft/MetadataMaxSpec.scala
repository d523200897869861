package graft

import org.apache.spark.sql.functions._

/** ops/MetadataMax: the footer-stats MAX must (a) rewrite exactly the
  * shapes it claims, (b) refuse everything else, and (c) agree with
  * the full-scan answer bit-for-bit on every edge it does take —
  * multi-file, empty, all-null, IFNULL/interval arithmetic above the
  * MAX. The script front door's offset SET rides this path
  * (SqlScriptSpec pins script ≡ Scala-protocol hashes end-to-end).
  */
class MetadataMaxSpec extends SparkSuite {
  import graft.ops.MetadataMax

  private def scalarViaRewrite(sql: String): (Boolean, Any) = {
    val df = spark.sql(sql)
    MetadataMax.rewrite(spark, df.queryExecution.optimizedPlan) match {
      case Some(p) =>
        (true, org.apache.spark.sql.GraftSqlBridge.ofRows(spark, p).first())
      case None => (false, df.first())
    }
  }

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_metamax/$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  test("timestamp MAX from footers equals full scan (multi-file)") {
    val dir = freshDir("ts")
    spark.range(0, 1000).repartition(4)
      .select(col("id"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_ts")
    val q = "SELECT IFNULL(MAX(ts) - INTERVAL 3 DAY," +
      " CAST('1900-01-01' AS timestamp)) FROM mm_ts"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "eligible shape must take the footer path")
    assert(viaStats === full)
  }

  test("long + date MAX in one aggregate, both from footers") {
    val dir = freshDir("multi")
    spark.range(0, 500).repartition(3)
      .select(col("id"), date_add(lit("2024-01-01").cast("date"),
        (col("id") % 90).cast("int")).as("d"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_multi")
    val q = "SELECT MAX(id), MAX(d) FROM mm_multi"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten)
    assert(viaStats === full)
  }

  test("empty table and all-null column both yield NULL, not a lie") {
    val dir = freshDir("empty")
    spark.range(0, 10).select(col("id"),
        lit(null).cast("timestamp").as("ts"))
      .limit(0).write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_empty")
    val qe = "SELECT IFNULL(MAX(ts), CAST('1900-01-01' AS timestamp))" +
      " FROM mm_empty"
    val (rw1, v1) = scalarViaRewrite(qe)
    assert(rw1 && v1 === spark.sql(qe).first())

    val dir2 = freshDir("allnull")
    spark.range(0, 10).select(col("id"),
        lit(null).cast("timestamp").as("ts"))
      .write.parquet(dir2)
    spark.read.parquet(dir2).createOrReplaceTempView("mm_allnull")
    val qn = "SELECT IFNULL(MAX(ts), CAST('1900-01-01' AS timestamp))" +
      " FROM mm_allnull"
    val (rw2, v2) = scalarViaRewrite(qn)
    assert(rw2 && v2 === spark.sql(qn).first())
  }

  test("refusals: filter, non-MAX sibling, string MAX, INT96") {
    val dir = freshDir("refuse")
    spark.range(0, 100)
      .select(col("id"), concat(lit("s"), col("id")).as("s"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_refuse")
    for (q <- Seq(
        "SELECT MAX(ts) FROM mm_refuse WHERE id > 10",
        "SELECT MAX(ts), COUNT(*) FROM mm_refuse",
        "SELECT MAX(s) FROM mm_refuse",
        "SELECT MAX(ts) FROM mm_refuse GROUP BY id % 2")) {
      val df = spark.sql(q)
      assert(MetadataMax.rewrite(spark,
        df.queryExecution.optimizedPlan).isEmpty, s"must refuse: $q")
    }
    // INT96 (the Spark default encoding) has no usable stats: refuse
    val dir96 = freshDir("int96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try spark.range(0, 50)
      .select((lit("2024-01-01 00:00:00").cast("timestamp")
        + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir96)
    finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.read.parquet(dir96).createOrReplaceTempView("mm_int96")
    val df96 = spark.sql("SELECT MAX(ts) FROM mm_int96")
    assert(MetadataMax.rewrite(spark,
      df96.queryExecution.optimizedPlan).isEmpty)
  }

  test("constant-branch global aggregate folds without touching data") {
    val dir = freshDir("constagg")
    spark.range(0, 100)
      .select((lit("2024-01-01 00:00:00").cast("timestamp")
        + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_const")
    // the script's FULL_LOAD shape: the CASE folds to the constant
    // branch, the MAX disappears, but the global aggregate (one row)
    // over the relation remains — must fold to Project/OneRowRelation
    val q = "SELECT CASE WHEN 'FULL_LOAD' = 'FULL_LOAD'" +
      " THEN CAST('1900-01-01' AS timestamp)" +
      " ELSE IFNULL(MAX(ts), CAST('1900-01-01' AS timestamp)) END" +
      " FROM mm_const"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "constant global aggregate must fold")
    assert(viaStats === full)
  }

  test("property: footer max == scan max for random longs (negatives included)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic ScalaCheck sampling (the repo convention): three
    // fixed seeds, values spanning sign boundaries and Long extremes
    val gen = Gen.listOfN(200, Gen.oneOf(
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.choose(-1000L, 1000L),
      Gen.const(Long.MinValue + 1), Gen.const(Long.MaxValue)))
    (1 to 3).foreach { i =>
      val vals = gen(org.scalacheck.Gen.Parameters.default,
        Seed(42L + i)).get
      val dir = freshDir(s"prop$i")
      import SparkSpec.spark.implicits._
      vals.toDF("v").repartition(3).write.parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView("mm_prop")
      val q = "SELECT MAX(v) FROM mm_prop"
      val full = spark.sql(q).first()
      val (rewritten, viaStats) = scalarViaRewrite(q)
      assert(rewritten, s"seed ${42 + i}: must take the footer path")
      assert(viaStats === full, s"seed ${42 + i}")
    }
  }

  test("scalar subquery inside a SET-shaped statement is rewritten") {
    val dir = freshDir("subq")
    spark.range(0, 200)
      .select((lit("2024-06-01 00:00:00").cast("timestamp")
        + expr("make_interval(0,0,0,0,0,0,id)")).as("cdc_ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_subq")
    val q = "SELECT date_format((SELECT IFNULL(MAX(cdc_ts) - INTERVAL 3" +
      " DAY, CAST('1900-01-01' AS timestamp)) FROM mm_subq)," +
      " 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "the subquery aggregate must take the footer path")
    assert(viaStats === full)
  }
}
