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
}
