package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.SqlScript
import graft.queries.LoadQueries

/** The whole-script SQL front door: template binding, statement
  * grouping (IF/ELSE/END IF), variable scope + @@row_count, the
  * COPY/TRUNCATE/DROP DDL lowering, CALL dispatch — and the headline
  * guarantee that the script-driven load equals the Scala-protocol
  * load bit for bit (q172 vs q12). */
class SqlScriptSpec extends SparkSuite {

  private def base(tag: String) = {
    val p = s"/tmp/graft_sqlscript_spec/$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("bindTemplate replaces params and rejects holes") {
    assert(SqlScript.bindTemplate(
      "a {{params.x}} b {{ params.y }} c",
      Map("x" -> "1", "y" -> "2")) == "a 1 b 2 c")
    intercept[IllegalArgumentException] {
      SqlScript.bindTemplate("{{params.missing}}", Map.empty)
    }
  }

  test("stripComments preserves strings and backticks") {
    val s = "SELECT '--not a comment' /* gone */ , `a--b` -- gone\nFROM t"
    val out = SqlScript.stripComments(s)
    assert(out.contains("'--not a comment'"))
    assert(out.contains("`a--b`"))
    assert(!out.contains("gone"))
  }

  test("DECLARE/SET/IF/@@row_count: variables thread through statements") {
    val b = base("vars")
    val t = s"$b/t"
    spark.range(10).selectExpr("id", "id * 2 AS v")
      .write.parquet(t)
    val res = SqlScript.execute(spark,
      """BEGIN
        |DECLARE v_n int64;
        |DECLARE v_mode string;
        |SET v_mode = 'KEEP_SMALL';
        |IF v_mode = 'KEEP_SMALL' THEN
        |  DELETE FROM t WHERE id >= 7;
        |ELSE
        |  TRUNCATE TABLE t;
        |END IF;
        |SET v_n = (select @@row_count);
        |END;""".stripMargin,
      Map("t" -> t))
    assert(res.vars("v_n") == Some("3"))
    assert(spark.read.parquet(t).count() == 7)
  }

  test("ELSE branch executes when the condition is false; TRUNCATE counts removed rows") {
    val b = base("elseb")
    val t = s"$b/t"
    spark.range(5).write.parquet(t)
    val res = SqlScript.execute(spark,
      """BEGIN
        |DECLARE v_n int64;
        |IF 1 = 2 THEN
        |  DELETE FROM t WHERE id = 0;
        |ELSE
        |  TRUNCATE TABLE t;
        |END IF;
        |SET v_n = (select @@row_count);
        |END;""".stripMargin,
      Map("t" -> t))
    assert(res.vars("v_n") == Some("5"))
    assert(spark.read.parquet(t).count() == 0)
    // schema survives truncation (schema-bearing empty table)
    assert(spark.read.parquet(t).columns.toSeq == Seq("id"))
  }

  test("CREATE OR REPLACE TABLE … COPY clones bytes; DROP removes") {
    val b = base("copy")
    val src = s"$b/src"
    val dst = s"$b/dst"
    spark.range(100).selectExpr("id", "id % 7 AS g").write.parquet(src)
    SqlScript.execute(spark,
      """BEGIN
        |CREATE OR REPLACE TABLE `p.d.dst` COPY `p.d.src`;
        |END;""".stripMargin,
      Map("src" -> src, "dst" -> dst))
    assertSameRows(spark.read.parquet(src), spark.read.parquet(dst))
    SqlScript.execute(spark, "BEGIN DROP TABLE dst; END;",
      Map("src" -> src, "dst" -> dst))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst)))
  }

  test("DELETE NULL-predicate rows survive (SQL DELETE removes only TRUE)") {
    val b = base("nullpred")
    val t = s"$b/t"
    spark.createDataFrame(
      java.util.List.of[Row](Row(1L, java.lang.Long.valueOf(5L)),
        Row(2L, null), Row(3L, java.lang.Long.valueOf(1L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))).write.parquet(t)
    val res = SqlScript.execute(spark,
      "BEGIN DELETE FROM t WHERE x > 3; DECLARE v_n int64; " +
        "SET v_n = (select @@row_count); END;",
      Map("t" -> t))
    assert(res.vars("v_n") == Some("1"))
    assert(spark.read.parquet(t).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 3L))
  }

  test("timestamp variables round-trip with full microseconds") {
    val res = SqlScript.execute(spark,
      """BEGIN
        |DECLARE v_ts timestamp;
        |DECLARE v_s string;
        |SET v_ts = CAST('2024-03-01 10:20:30.123456' AS timestamp);
        |SET v_s = CAST(v_ts AS STRING);
        |END;""".stripMargin,
      Map.empty)
    assert(res.vars("v_ts") == Some("2024-03-01 10:20:30.123456"))
    assert(res.vars("v_s") == Some("2024-03-01 10:20:30.123456"))
  }

  test("CALL dispatches typed args to a bound procedure") {
    var got: Seq[Any] = Nil
    SqlScript.execute(spark,
      """BEGIN
        |DECLARE v_n int64;
        |SET v_n = 42;
        |CALL p('hello', v_n, 7);
        |END;""".stripMargin,
      Map.empty, Map("p" -> (args => got = args)))
    assert(got == Seq("hello", 42L, 7L))
  }

  test("nested IF and IF-without-ELSE resolve correctly") {
    val res = SqlScript.execute(spark,
      """BEGIN
        |DECLARE v_a int64;
        |DECLARE v_b int64;
        |SET v_a = 0;
        |SET v_b = 0;
        |IF 1 = 1 THEN
        |  IF 2 = 3 THEN
        |    SET v_a = 10;
        |  ELSE
        |    SET v_a = 20;
        |  END IF;
        |  SET v_b = 1;
        |ELSE
        |  SET v_a = 99;
        |END IF;
        |IF 5 > 4 THEN
        |  SET v_b = v_b + 100;
        |END IF;
        |END;""".stripMargin,
      Map.empty)
    assert(res.vars("v_a") == Some("20"), s"got ${res.vars("v_a")}")
    assert(res.vars("v_b") == Some("101"), s"got ${res.vars("v_b")}")
  }

  test("unsupported statements and unbound tables throw") {
    intercept[IllegalArgumentException] {
      SqlScript.execute(spark, "BEGIN GRANT ALL ON x TO y; END;", Map.empty)
    }
    intercept[IllegalArgumentException] {
      SqlScript.execute(spark, "BEGIN DROP TABLE nope; END;", Map.empty)
    }
  }

  test("crash drill: certified script staging rolls FORWARD; " +
      "markerless rolls BACK; mid-swap retire restores") {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val b = base("crash")
    val src = s"$b/src"
    val dst = s"$b/dst"
    spark.range(100).selectExpr("id", "id % 7 AS g").write.parquet(src)
    def runCopy(): Unit = SqlScript.execute(spark,
      "BEGIN CREATE OR REPLACE TABLE dst COPY src; END;",
      Map("src" -> src, "dst" -> dst))
    runCopy()
    val live = spark.read.parquet(dst).collect().toSet

    // drill 1 — crash BETWEEN staging-complete and swap: a certified
    // staging (marker present) beside the live table. The next script
    // run must roll it forward (publish tail re-run), not leave or
    // double-publish it.
    val stg = new Path(dst + "__scriptstage")
    spark.range(50).selectExpr("id + 1000 AS id", "id % 7 AS g")
      .write.parquet(stg.toString)
    graft.etl.IncrementalLoad.writeMarker(fs, stg, "FULL")
    runCopy() // recovery runs first, then the statement republishes src
    assert(!fs.exists(stg), "certified staging must be consumed")
    assert(spark.read.parquet(dst).collect().toSet == live,
      "the re-run statement must land src's content after roll-forward")

    // drill 2 — crash MID-SWAP (target retired, staging not yet moved):
    // no live dir, certified staging, __retired snapshot. Recovery must
    // leave a complete generation BEFORE any statement reads the table.
    fs.rename(new Path(dst), new Path(dst + "__retired"))
    spark.range(50).selectExpr("id + 2000 AS id", "id % 7 AS g")
      .write.parquet(stg.toString)
    graft.etl.IncrementalLoad.writeMarker(fs, stg, "FULL")
    val log2 = SqlScript.recoverTable(spark, dst)
    assert(log2.exists(_.contains("FORWARD")), s"unexpected log: $log2")
    assert(fs.exists(new Path(dst)) && !fs.exists(stg) &&
      !fs.exists(new Path(dst + "__retired")),
      "forward roll must leave exactly the published generation")
    assert(spark.read.parquet(dst).filter("id >= 2000").count() == 50,
      "the certified staging is the newest complete generation — it wins")

    // drill 3 — crash DURING the staged write: markerless staging.
    // Rolled back untouched; the live table survives as-is.
    runCopy() // back to src content
    spark.range(5).selectExpr("id + 3000 AS id", "id % 7 AS g")
      .write.parquet(stg.toString) // no marker
    val log3 = SqlScript.recoverTable(spark, dst)
    assert(log3.exists(_.contains("BACK")), s"unexpected log: $log3")
    assert(!fs.exists(stg), "markerless staging must be dropped")
    assert(spark.read.parquet(dst).collect().toSet == live,
      "roll-back must leave the live table untouched")

    // drill 4 — crash between swap-in and marker drop: a stale marker
    // file inside the live table is swept, data untouched.
    graft.ops.CertFile.write(fs,
      new Path(dst, graft.etl.IncrementalLoad.markerName), "FULL")
    val log4 = SqlScript.recoverTable(spark, dst)
    assert(log4.exists(_.contains("stale")), s"unexpected log: $log4")
    assert(spark.read.parquet(dst).collect().toSet == live)
    assert(SqlScript.recoverTable(spark, dst).isEmpty,
      "recovery must be idempotent on a healthy table")
  }

  test("script-driven load equals the Scala-protocol load (q172 == q12, q173 counts)") {
    val viaScript = LoadQueries.q172.run(spark, sf)
    val viaProtocol = LoadQueries.q12.run(spark, sf)
    assertSameRows(viaScript, viaProtocol)
    val audit = LoadQueries.q173.run(spark, sf)
      .orderBy(col("load_type"))
      .select("load_type", "inserted_count", "deleted_count").collect()
    assert(audit.length == 2)
    val protAudit = LoadQueries.q13.run(spark, sf)
      .orderBy(col("load_type"))
      .select("load_type", "inserted_count", "deleted_count").collect()
    assert(audit.map(_.toString).toSeq == protAudit.map(_.toString).toSeq)
  }
}
