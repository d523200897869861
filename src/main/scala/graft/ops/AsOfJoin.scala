package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * with the same key and `rightTs <= leftTs`. The operator behind
  * point-in-time feature lookups and slowly-changing joins; Spark has no
  * native ASOF JOIN, so this composes it from a union + carry-forward
  * window (SURVEY §2.3 "custom operators: compose existing ops if
  * semantics allow").
  *
  * Shape: ONE shuffle (the window partition on the key) over
  * |left| + |right| rows — no range-explosion join, no per-row probe.
  * At equal timestamps the right row sorts first (tag 0 < 1), giving the
  * inclusive `<=` bound. Rows with no earlier right match carry NULLs
  * (left-join semantics).
  *
  * Scale: this is the sort-once formulation — at 10⁹+ rows it costs a
  * single repartition+sort, and AQE handles hot keys. The alternative
  * (bucketed range join) only wins when `right` per key is huge AND
  * lookback is bounded.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (carries `valueCols`)
    * @param key        equi key column name (both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param valueCols  right columns carried to the output (as-of values);
    *                    must not collide with left column names
    * @param leftOrder  extra left columns completing a total order (ties) */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      leftOrder: Seq[String] = Nil): DataFrame = {
    val lCols = left.columns.toSeq
    // All as-of values travel in ONE struct so the carry-forward picks a
    // single right row atomically — per-column last(ignoreNulls) would
    // blend columns from different right rows whenever a later right row
    // holds a NULL in one of the value columns.
    val rowStruct = struct(valueCols.map(col): _*)
    val nullStruct = {
      val fields = org.apache.spark.sql.types.StructType(valueCols.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
          nullable = true)))
      lit(null).cast(fields)
    }
    val l = left
      .withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
      .select(Seq(col(key), col("__ts"), col("__tag")) ++
        lCols.filterNot(_ == key).map(col) :+ nullStruct.as("__vals"): _*)
    val r = right
      .withColumn("__ts", col(rightTs)).withColumn("__tag", lit(0))
      .select(Seq(col(key), col("__ts"), col("__tag")) ++
        lCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rowStruct.as("__vals"): _*)
    val order: Seq[Column] =
      Seq(col("__ts").asc, col("__tag").asc) ++ leftOrder.map(col(_).asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select((lCols.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c))): _*)
  }
}
