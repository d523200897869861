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

  test("refusals: data filter, unsupported sibling, string MAX, INT96") {
    val dir = freshDir("refuse")
    spark.range(0, 100)
      .select(col("id"), concat(lit("s"), col("id")).as("s"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_refuse")
    for (q <- Seq(
        "SELECT MAX(ts) FROM mm_refuse WHERE id > 10",
        "SELECT MAX(ts), SUM(id) FROM mm_refuse",
        "SELECT COUNT(DISTINCT id) FROM mm_refuse",
        "SELECT MAX(s) FROM mm_refuse",
        "SELECT MIN(s) FROM mm_refuse",
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

  test("MIN + MAX + COUNT(*) + COUNT(col) in one aggregate, all from footers") {
    val dir = freshDir("faces")
    spark.range(0, 1000).repartition(4)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("v"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_faces")
    val q = "SELECT MIN(ts), MAX(ts), MIN(v), MAX(v), COUNT(*), COUNT(v)," +
      " COUNT(ts) FROM mm_faces"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "all faces supported: must take the footer path")
    assert(viaStats === full)
  }

  test("counts over empty and all-null input are 0/0, min NULL — not a lie") {
    val dir = freshDir("cnt0")
    spark.range(0, 10).select(col("id"),
        lit(null).cast("long").as("v"))
      .write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_cnt0")
    val q = "SELECT COUNT(*), COUNT(v), MIN(v) FROM mm_cnt0"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten && viaStats === full)
  }

  test("partition-pruning filter is eligible; data filter is not") {
    val dir = freshDir("part")
    spark.range(0, 300)
      .select(col("id"),
        (col("id") % 3).cast("int").as("day"),
        (lit("2024-03-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.partitionBy("day").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_part")
    val q = "SELECT MAX(ts), MIN(id), COUNT(*) FROM mm_part WHERE day = 1"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "partition-only filter must take the footer path")
    assert(viaStats === full)
    // same shape, but MIN/MAX/COUNT of the PARTITION column: refuse
    // (no footer presence; the null partition would lie)
    val qp = "SELECT MAX(day) FROM mm_part"
    assert(MetadataMax.rewrite(spark,
      spark.sql(qp).queryExecution.optimizedPlan).isEmpty)
    // filter touching a DATA column: refuse
    val qd = "SELECT MAX(ts) FROM mm_part WHERE day = 1 AND id > 5"
    assert(MetadataMax.rewrite(spark,
      spark.sql(qd).queryExecution.optimizedPlan).isEmpty)
  }

  test("foreign-written directory (non-.parquet data file) refuses") {
    val dir = freshDir("foreign")
    spark.range(0, 100).select(col("id")).write.parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // simulate a Hive-written data file: rename one part file so it
    // loses the .parquet suffix — the table still READS fine, but the
    // footer fold must refuse rather than answer from a subset
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(
      part.getParent, "000000_0"))
    spark.read.parquet(dir).createOrReplaceTempView("mm_foreign")
    for (q <- Seq("SELECT MAX(id) FROM mm_foreign",
        "SELECT COUNT(*) FROM mm_foreign")) {
      assert(MetadataMax.rewrite(spark,
        spark.sql(q).queryExecution.optimizedPlan).isEmpty, s"must refuse: $q")
    }
  }

  test("LEGACY datetime rebase marker refuses temporal min/max, not counts") {
    val dir = freshDir("rebase")
    val key = "spark.sql.parquet.datetimeRebaseModeInWrite"
    val prev = spark.conf.get(key, "EXCEPTION")
    spark.conf.set(key, "LEGACY")
    try spark.range(0, 50)
      .select(col("id"), date_add(lit("1500-01-01").cast("date"),
        col("id").cast("int")).as("d"))
      .write.parquet(dir)
    finally spark.conf.set(key, prev)
    spark.read.parquet(dir).createOrReplaceTempView("mm_rebase")
    // the scan rebases Julian→proleptic on read; footer values differ
    assert(MetadataMax.rewrite(spark,
      spark.sql("SELECT MAX(d) FROM mm_rebase")
        .queryExecution.optimizedPlan).isEmpty)
    assert(MetadataMax.rewrite(spark,
      spark.sql("SELECT MIN(d) FROM mm_rebase")
        .queryExecution.optimizedPlan).isEmpty)
    // counts and non-temporal extremes are rebase-immune: still folded
    val q = "SELECT COUNT(*), COUNT(d), MAX(id) FROM mm_rebase"
    val full = spark.sql(q).first()
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten && viaStats === full)
  }

  test("property: footer min/max/count == scan for random nullable longs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(200, Gen.oneOf(
      Gen.option(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)),
      Gen.option(Gen.choose(-1000L, 1000L)),
      Gen.const(Some(Long.MinValue + 1)), Gen.const(Some(Long.MaxValue)),
      Gen.const(None)))
    (1 to 3).foreach { i =>
      val vals = gen(org.scalacheck.Gen.Parameters.default,
        Seed(4242L + i)).get
      val dir = freshDir(s"propmc$i")
      import SparkSpec.spark.implicits._
      vals.toDF("v").repartition(3).write.parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView("mm_propmc")
      val q = "SELECT MIN(v), MAX(v), COUNT(*), COUNT(v) FROM mm_propmc"
      val full = spark.sql(q).first()
      val (rewritten, viaStats) = scalarViaRewrite(q)
      assert(rewritten, s"seed ${4242 + i}: must take the footer path")
      assert(viaStats === full, s"seed ${4242 + i}")
    }
  }

  test("partition filter containing a scalar subquery refuses, never crashes") {
    val dir = freshDir("subqfilter")
    spark.range(0, 300)
      .select(col("id"),
        (col("id") % 3).cast("int").as("day"),
        (lit("2024-03-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.partitionBy("day").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_subqf")
    // cond.references is just {day} and the condition is deterministic,
    // but a ScalarSubquery is Unevaluable during partition pruning —
    // the gate must refuse BEFORE listFiles, not throw inside it
    for (q <- Seq(
        "SELECT MAX(ts) FROM mm_subqf WHERE day = (SELECT MAX(day) FROM mm_subqf)",
        "SELECT COUNT(*) FROM mm_subqf WHERE day IN (SELECT day FROM mm_subqf WHERE day > 1)")) {
      val plan = spark.sql(q).queryExecution.optimizedPlan
      assert(MetadataMax.rewrite(spark, plan).isEmpty, s"must refuse: $q")
    }
    // the script front door rides the same path with no try/catch:
    // a SET-shaped statement with a subquery filter must fall back to
    // the scan answer, not crash the whole script
    val setShaped = "SELECT MAX(ts) FROM mm_subqf" +
      " WHERE day = (SELECT MAX(day) FROM mm_subqf)"
    val full = spark.sql(setShaped).first()
    val (rewritten, v) = scalarViaRewrite(setShaped)
    assert(!rewritten && v === full)
  }

  test("parquetRowCount ignores files under hidden dirs, like the scan") {
    val dir = freshDir("hiddenrc")
    spark.range(0, 123).select(col("id")).write.parquet(dir)
    val scanCount = spark.read.parquet(dir).count()
    assert(MetadataMax.parquetRowCount(spark, dir) === Some(scanCount))
    // plant parquet under _temporary/ and .staging/ — the debris a
    // crashed write or mid-compaction leaves; a Spark scan ignores
    // them, so the footer count must too
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    for (hidden <- Seq("_temporary/0/task_1", ".staging")) {
      val sub = new org.apache.hadoop.fs.Path(s"$dir/$hidden")
      fs.mkdirs(sub)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
        new org.apache.hadoop.fs.Path(sub, part.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }
    assert(spark.read.parquet(dir).count() === scanCount,
      "precondition: the scan itself ignores hidden dirs")
    assert(MetadataMax.parquetRowCount(spark, dir) === Some(scanCount))
    // a NON-parquet visible file still refuses (foreign dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "000000_0"))
    out.write(1); out.close()
    assert(MetadataMax.parquetRowCount(spark, dir).isEmpty)
  }

  test("parquetRowCount under a hidden-named ANCESTOR counts, never " +
      "lies Some(0)") {
    // r15 ADVICE: listFiles returns fully-qualified paths, so the
    // hidden-name walk must stop at the QUALIFIED table root — with
    // the raw root, a table living under /….cache/… filtered every
    // file out and answered Some(0) where the scan reads real rows
    val dir = freshDir(".cachedroot") + "/tbl"
    spark.range(0, 77).select(col("id")).write.parquet(dir)
    val scanCount = spark.read.parquet(dir).count()
    assert(scanCount === 77L)
    assert(MetadataMax.parquetRowCount(spark, dir) === Some(scanCount))
    // and when files exist but ALL are hidden (mid-write debris only),
    // refuse rather than report an empty table
    val dir2 = freshDir("allhidden")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val one = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val sub = new org.apache.hadoop.fs.Path(s"$dir2/_temporary/0")
    fs.mkdirs(sub)
    org.apache.hadoop.fs.FileUtil.copy(fs, one, fs,
      new org.apache.hadoop.fs.Path(sub, one.getName),
      false, spark.sparkContext.hadoopConfiguration)
    assert(MetadataMax.parquetRowCount(spark, dir2).isEmpty,
      "all-hidden dir must refuse, not answer Some(0)")
  }

  test("every metadata face still folds after compaction (and refuses after INT96 rewrite)") {
    // q216/q219 rewrite files; q217/q218/q220 depend on footer stats
    // being present and exact afterward — pin that the compacted table
    // qualifies for every face, flat and partitioned
    val dir = freshDir("compactfold")
    val write = spark.range(0, 1000).repartition(6)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("v"),
        (lit("2024-05-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
    write.write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("mm_cf")
    val q = "SELECT MIN(ts), MAX(ts), MIN(v), MAX(v), COUNT(*), COUNT(v)," +
      " COUNT(ts) FROM mm_cf"
    val before = spark.sql(q).first()
    assert(graft.ops.Compact.compactSmall(spark, dir,
      smallBytes = 64L << 20) > 0, "the 6 small files must compact")
    spark.read.parquet(dir).createOrReplaceTempView("mm_cf")
    val (rewritten, viaStats) = scalarViaRewrite(q)
    assert(rewritten, "a compacted table must still take the footer path")
    assert(viaStats === before)

    // partitioned layout: compactSmall recurses into k=v leaves; the
    // pruned-partition face must survive too
    val pdir = freshDir("compactfoldp")
    spark.range(0, 300).repartition(5)
      .select(col("id"), (col("id") % 3).cast("int").as("day"),
        (lit("2024-05-01 00:00:00").cast("timestamp")
          + expr("make_interval(0,0,0,0,0,0,id)")).as("ts"))
      .write.partitionBy("day").parquet(pdir)
    spark.read.parquet(pdir).createOrReplaceTempView("mm_cfp")
    val qp = "SELECT MAX(ts), MIN(id), COUNT(*) FROM mm_cfp WHERE day = 1"
    val beforeP = spark.sql(qp).first()
    assert(graft.ops.Compact.compactSmall(spark, pdir,
      smallBytes = 64L << 20) > 0)
    spark.read.parquet(pdir).createOrReplaceTempView("mm_cfp")
    val (rwP, vP) = scalarViaRewrite(qp)
    assert(rwP && vP === beforeP)

    // refusal drill: a compaction run under an INT96 writer config
    // strips usable timestamp stats — temporal min/max must refuse
    // (counts and long extremes still fold)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try assert(graft.ops.Compact.compact(spark, dir) > 0,
      "whole-table re-compact under INT96")
    finally spark.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.read.parquet(dir).createOrReplaceTempView("mm_cf96")
    assert(MetadataMax.rewrite(spark,
      spark.sql("SELECT MAX(ts) FROM mm_cf96")
        .queryExecution.optimizedPlan).isEmpty,
      "INT96-rewritten timestamps must refuse")
    val q96 = "SELECT COUNT(*), COUNT(ts), MAX(v) FROM mm_cf96"
    val full96 = spark.sql(q96).first()
    val (rw96, v96) = scalarViaRewrite(q96)
    assert(rw96 && v96 === full96)
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
