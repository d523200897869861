package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StructField, StructType}

/** Native nearest-centroid argmin over an integer-scaled vector column
  * against a FIXED codebook (the k-means assignment hot path,
  * [[graft.ops.KMeans]]): per row, squared L2 distance to each of the
  * k codebook cells, returning `struct(cid, d2)` of the winner with
  * the (d2, cid)-lexicographic tie-break every other assignment form
  * uses.
  *
  * WHY CUSTOM (the r16 PERF.md lever, measured before built): the
  * shipped composable form ([[graft.ops.KMeans.assignFolded]] —
  * codebook as one array<struct> literal, argmin folded by
  * `aggregate`) evaluates interpreted higher-order functions at
  * ≈5.9 µs per row·cell: every element comparison walks the lambda
  * interpreter and allocates through ArrayData. Here the codebook
  * rides the expression as two flat primitive arrays (codegen
  * reference objects — constant PLAN size at any k, same property
  * that makes assignFolded survive 10^3+ cells where the k-struct
  * projection form dies in planning) and the k·dim loop is one
  * allocation-free primitive pass. Same integer arithmetic, same
  * tie-break — bit-identical to all three prior forms (KnnGraphSpec
  * pins the quad-form identity).
  *
  * Null/shape semantics: NULL input → NULL (the composable forms map
  * a NULL vector to a MaxValue sentinel row instead, but no caller
  * produces NULL `iv` — it is `Similarity.intVec` of a non-null
  * embedding; the identity spec pins agreement on real data). A
  * vector shorter than `dim` contributes its common prefix, matching
  * `zip_with` on the equal-length inputs every caller supplies.
  */
case class NearestCell(child: Expression, cids: Seq[Long], flat: Seq[Long],
    dim: Int) extends UnaryExpression {

  require(cids.nonEmpty, "NearestCell: empty codebook")
  require(dim >= 1 && flat.length == cids.length * dim,
    s"NearestCell: flat codebook length ${flat.length} != " +
      s"${cids.length} cells x $dim dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("d2", LongType, nullable = false)))
  override def prettyName: String = "nearest_cell"

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val flatArr: Array[Long] = flat.toArray

  override def nullSafeEval(v: Any): Any =
    NearestCell.nearest(v.asInstanceOf[ArrayData], cidArr, flatArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flatArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCell.nearest($c, $cidsRef, $flatRef, $dim)")
  }
}

object NearestCell {

  /** argmin_{c} Σ_i (iv[i] − codebook[c][i])² with ties to the smallest
    * cid — order-independent (global (d2, cid) lexicographic minimum,
    * exactly `min(struct(d2, cid))`). Exact 64-bit integer arithmetic;
    * public + static-reachable for codegen. */
  def nearest(iv: ArrayData, cids: Array[Long], flat: Array[Long],
      dim: Int): InternalRow = {
    val k = cids.length
    val n = math.min(iv.numElements(), dim)
    var bd2 = Long.MaxValue
    var bcid = Long.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d2 = 0L
      var i = 0
      while (i < n) {
        val d = iv.getLong(i) - flat(base + i)
        d2 += d * d
        i += 1
      }
      val cid = cids(c)
      if (d2 < bd2 || (d2 == bd2 && cid < bcid)) { bd2 = d2; bcid = cid }
      c += 1
    }
    new GenericInternalRow(Array[Any](bcid, bd2))
  }

  /** Column-API wrapper over a collected codebook
    * ([[graft.ops.KMeans.trainCodebook]]'s shape). All cells must share
    * one dimensionality. */
  def apply(iv: Column, cent: Seq[(Long, Seq[Long])]): Column = {
    require(cent.nonEmpty, "nearest_cell: empty codebook")
    val dim = cent.head._2.length
    require(cent.forall(_._2.length == dim),
      "nearest_cell: ragged codebook (cells must share one dim)")
    GraftSqlBridge.column(NearestCell(GraftSqlBridge.expression(iv),
      cent.map(_._1), cent.flatMap(_._2), dim))
  }
}
