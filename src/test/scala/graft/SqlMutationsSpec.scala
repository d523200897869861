package graft

import org.apache.spark.sql.functions._

import graft.ops.SqlMutations

/** The SQL front door for mutations: MERGE lowering semantics
  * (first-applicable WHEN chains, conditional inserts, keep-by-default)
  * and DELETE routing to the targeted-erase protocol. */
class SqlMutationsSpec extends SparkSuite {

  import SparkSpec.spark.implicits._

  private def target() = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "name", "v")

  test("MERGE: conditional delete, conditional+unconditional update, insert") {
    target().createOrReplaceTempView("t_tgt")
    Seq((1L, "D", 0L), (2L, "U", 99L), (3L, "U", 77L), (9L, "I", 55L))
      .toDF("k", "op", "nv").createOrReplaceTempView("t_src")
    val out = SqlMutations.merge(spark,
      """MERGE INTO t_tgt t USING t_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED AND s.nv > 80 THEN UPDATE SET v = s.nv, name = 'big'
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, name, v)
        |  VALUES (s.k, 'new', s.nv)""".stripMargin)
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      // 1 deleted; 2 hits the nv>80 clause FIRST (name rewritten);
      // 3 falls to the unconditional update; 4 unmatched → kept;
      // 9 inserted
      (2L, "big", 99L), (3L, "c", 77L), (4L, "d", 40L), (9L, "new", 55L)))
  }

  test("MERGE: matched row with no applicable clause is kept unchanged") {
    target().createOrReplaceTempView("t_tgt")
    Seq((2L, "X", 1L)).toDF("k", "op", "nv")
      .createOrReplaceTempView("t_src")
    val out = SqlMutations.merge(spark,
      """MERGE INTO t_tgt t USING t_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE""".stripMargin)
    assert(out.count() == 4)
    assert(out.filter(col("k") === 2 && col("v") === 20).count() == 1)
  }

  test("MERGE: conditional inserts are first-applicable, not cumulative") {
    target().limit(0).createOrReplaceTempView("t_tgt")
    Seq((8L, "I", 5L), (9L, "I", 50L)).toDF("k", "op", "nv")
      .createOrReplaceTempView("t_src")
    val out = SqlMutations.merge(spark,
      """MERGE INTO t_tgt t USING t_src s ON t.k = s.k
        |WHEN NOT MATCHED AND s.nv >= 10 THEN INSERT (k, name, v)
        |  VALUES (s.k, 'big', s.nv)
        |WHEN NOT MATCHED THEN INSERT (k, name, v)
        |  VALUES (s.k, 'small', s.nv)""".stripMargin)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((8L, "small"), (9L, "big")))
  }

  test("MERGE: unsupported shapes are rejected, never silently wrong") {
    target().createOrReplaceTempView("t_tgt")
    target().createOrReplaceTempView("t_src2")
    intercept[IllegalArgumentException] {
      SqlMutations.merge(spark,
        """MERGE INTO t_tgt t USING t_src2 s ON t.k = s.k
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      SqlMutations.merge(spark, "SELECT 1")
    }
  }

  test("MERGE: >1 source match per target row throws cardinality violation") {
    target().createOrReplaceTempView("t_tgt")
    // source matches target row k=2 TWICE — SQL and Spark's native
    // MERGE raise MERGE_CARDINALITY_VIOLATION; the left-join lowering
    // must not silently apply WHEN MATCHED once per match
    Seq((2L, "U", 99L), (2L, "U", 77L), (9L, "I", 55L))
      .toDF("k", "op", "nv").createOrReplaceTempView("t_src")
    val ex = intercept[IllegalStateException] {
      SqlMutations.merge(spark,
        """MERGE INTO t_tgt t USING t_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (k, name, v)
          |  VALUES (s.k, 'new', s.nv)""".stripMargin)
    }
    assert(ex.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
    // insert-only MERGE is exempt: duplicate matches cannot duplicate
    // target rows when no matched action exists
    val out = SqlMutations.merge(spark,
      """MERGE INTO t_tgt t USING t_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, name, v)
        |  VALUES (s.k, 'new', s.nv)""".stripMargin)
    assert(out.count() == 5)
  }

  test("UPDATE: duplicate SET targets are rejected, not last-wins") {
    target().createOrReplaceTempView("t_tgt")
    val ex = intercept[IllegalArgumentException] {
      SqlMutations.update(spark, "UPDATE t_tgt SET v = 1, V = 2")
    }
    assert(ex.getMessage.contains("duplicate assignment target"))
  }

  test("UPDATE: conditional column rewrite, unassigned columns kept") {
    target().createOrReplaceTempView("t_tgt")
    val out = SqlMutations.update(spark,
      "UPDATE t_tgt t SET v = v * 2, name = 'boosted' WHERE k >= 3")
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "boosted", 60L), (4L, "boosted", 80L)))
    // no WHERE → every row rewritten
    val all = SqlMutations.update(spark, "UPDATE t_tgt SET v = 0")
      .agg(sum(col("v"))).first().getLong(0)
    assert(all == 0L)
  }

  test("INSERT: appends through statement text, aligns a scrambled " +
      "column list, rejects OVERWRITE") {
    val dir = "/tmp/graft_test_sql_insert"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    target().limit(0).write.parquet(dir) // schema-bearing empty target
    Seq((7L, "x", 70L), (8L, "y", 80L)).toDF("k", "name", "v")
      .createOrReplaceTempView("t_ins_src")
    // SELECT order (v, k, name) differs from the target's (k, name, v):
    // the column list renames positionally, alignment reorders by name
    val n = SqlMutations.insert(spark,
      """INSERT INTO t_tbl (v, k, name)
        |SELECT v * 10, k, upper(name) FROM t_ins_src""".stripMargin,
      Map("t_tbl" -> dir))
    assert(n == 2)
    val rows = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((7L, "X", 700L), (8L, "Y", 800L)))
    // appends accumulate (the append protocol, not a replace)
    SqlMutations.insert(spark,
      "INSERT INTO t_tbl SELECT k + 10, name, v FROM t_ins_src",
      Map("t_tbl" -> dir))
    assert(spark.read.parquet(dir).count() == 4)
    intercept[IllegalArgumentException] {
      SqlMutations.insert(spark,
        "INSERT OVERWRITE t_tbl SELECT k, name, v FROM t_ins_src",
        Map("t_tbl" -> dir))
    }
    intercept[IllegalArgumentException] {
      SqlMutations.insert(spark, "SELECT 1", Map("t_tbl" -> dir))
    }
  }

  test("DELETE: routes key tombstones to the file surgery; rejects " +
      "non-tombstone predicates") {
    val dir = "/tmp/graft_test_sql_delete"
    Seq((1L, 10L), (2L, 20L), (7L, 70L), (9L, 90L)).toDF("user_id", "v")
      .repartitionByRange(2, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val stats = SqlMutations.delete(spark,
      "DELETE FROM ev WHERE user_id IN (2, 7)", Map("ev" -> dir))
    assert(stats.rowsDeleted == 2)
    assert(spark.read.parquet(dir).select("user_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 9L))
    intercept[IllegalArgumentException] {
      SqlMutations.delete(spark,
        "DELETE FROM ev WHERE user_id > 5", Map("ev" -> dir))
    }
  }
}
