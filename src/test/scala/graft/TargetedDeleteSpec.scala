package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.TargetedDelete
import graft.tables.Catalog

class TargetedDeleteSpec extends SparkSuite {

  private val base = "/tmp/graft_erase/spec/events_by_user"

  private def stage(): Unit =
    Catalog.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartitionByRange(8, col("user_id"))
      .write.mode("overwrite").parquet(base)

  test("erase removes exactly the tombstoned keys and rewrites few files") {
    stage()
    val before = spark.read.parquet(base)
      .filter(!col("user_id").isin(7L, 42L))
      .collect().map(_.toString).sorted.toSeq

    val st = TargetedDelete.erase(spark, base, "user_id", Seq(7L, 42L))
    assert(st.filesTotal == 8, s"expected 8 range files, got ${st.filesTotal}")
    // 2 keys against an 8-file range clustering: at most 3 files can
    // cover them (each key lives in 1, +1 for a boundary straddle)
    assert(st.filesRewritten <= 3,
      s"clustered layout failed to localize the delete: ${st.filesRewritten}")
    assert(st.filesRewritten >= 1 && st.rowsDeleted > 0)

    val after = spark.read.parquet(base)
    assert(after.filter(col("user_id").isin(7L, 42L)).count() == 0)
    assert(after.collect().map(_.toString).sorted.toSeq == before)
  }

  test("untouched files keep their exact bytes (same path, same length, same mtime)") {
    stage()
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(new Path(base))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime)).toMap

    val st = TargetedDelete.erase(spark, base, "user_id", Seq(42L))
    val after = fs.listStatus(new Path(base))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime)).toMap

    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size >= before.size - st.filesRewritten.toInt)
    untouched.foreach { name =>
      assert(before(name) == after(name), s"$name was modified")
    }
  }

  test("erasing absent keys rewrites nothing") {
    stage()
    val st = TargetedDelete.erase(spark, base, "user_id", Seq(-1L))
    assert(st.filesRewritten == 0 && st.rowsDeleted == 0)
  }

  test("NULL-key rows survive an erase; an all-NULL file never crashes the stats pass") {
    import SparkSpec.spark.implicits._
    val dir = "/tmp/graft_erase/spec/nullable_keys"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // file 1: mixed keys incl. NULLs; file 2: entirely NULL keys
    Seq((Some(1L), "a"), (Some(7L), "b"), (None, "c"), (None, "d"))
      .toDF("user_id", "v").coalesce(1).write.parquet(dir)
    Seq((Option.empty[Long], "e"), (Option.empty[Long], "f"))
      .toDF("user_id", "v").coalesce(1).write.mode("append").parquet(dir)

    val st = TargetedDelete.erase(spark, dir, "user_id", Seq(7L))
    assert(st.rowsDeleted == 1, s"only the key-7 row goes: $st")
    val left = spark.read.parquet(dir).collect()
      .map(r => (if (r.isNullAt(0)) -99L else r.getLong(0), r.getString(1)))
      .sortBy(_._2).toSeq
    assert(left == Seq((1L, "a"), (-99L, "c"), (-99L, "d"),
      (-99L, "e"), (-99L, "f")).sortBy(_._2))
  }
}
