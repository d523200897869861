package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JOIN-SIZE ESTIMATION FROM SKETCHES (AMS '99 / Cormode-Muthukrishnan
  * '05): `|A ⋈_k B| = Σ_k cntA(k)·cntB(k)` — the inner product of the
  * two key-frequency vectors — is estimated by the inner product of
  * their count-min tables, `min_i Σ_j tableA[i][j]·tableB[i][j]`,
  * WITHOUT executing the join or touching either table's distinct key
  * set. This is what a cost-based planner needs to choose broadcast vs
  * shuffle vs skew handling BEFORE committing to a plan: each side is
  * scanned once (the sketch agg is map-side combined), the sketches are
  * a few KB each, and the estimate is one driver-side expression.
  *
  * Guarantees (fixed seed → fully deterministic): `est ≥ true` always
  * (collisions only add mass), and `est ≤ true + ε·Na·Nb` with
  * probability 1−δ for width ⌈e/ε⌉, depth ⌈ln(1/δ)⌉.
  *
  * Spark's builtin `CountMinSketch` hides its table (no inner-product
  * API), so this is a from-scratch table: depth×width longs, row-i hash
  * = splitmix64(key ⊕ seed_i) mod width. Serialized form:
  * [depth:int][width:int][seed:long][cells:long…].
  */
object FreqSketch {

  private[functions] def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[functions] def bucket(key: Long, row: Int, seed: Long, width: Int): Int = {
    val h = mix(key ^ mix(seed + row))
    // non-negative mod
    ((h % width + width) % width).toInt
  }

  def agg(c: Column, depth: Int, width: Int, seed: Long): Column =
    GraftSqlBridge.column(
      FreqSketchAgg(GraftSqlBridge.expression(c), depth, width, seed)
        .toAggregateExpression())

  def innerProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(SketchInnerProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Builds the depth×width count table over a BIGINT key column; buffer
  * merge is elementwise add, so partial aggregation (map-side combine)
  * works and the shuffle carries one table per group per mapper. */
case class FreqSketchAgg(child: Expression, depth: Int, width: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + FreqSketch.bucket(k, i, seed, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 * buf.length)
    bb.putInt(depth).putInt(width).putLong(seed)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt(); bb.getInt(); bb.getLong() // header re-derived from ctor
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `min_i Σ_j A[i][j]·B[i][j]` over two serialized FreqSketch tables —
  * the join-size estimate. Both sketches must share (depth, width,
  * seed); mismatch throws rather than silently estimating garbage. */
case class SketchInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = ByteBuffer.wrap(a.asInstanceOf[Array[Byte]])
    val bb = ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])
    val (da, wa, sa) = (ba.getInt, ba.getInt, ba.getLong)
    val (db, wb, sb) = (bb.getInt, bb.getInt, bb.getLong)
    require(da == db && wa == wb && sa == sb,
      s"incompatible sketches: ($da,$wa,$sa) vs ($db,$wb,$sb)")
    var best = Long.MaxValue
    var i = 0
    while (i < da) {
      var dot = 0L
      var j = 0
      while (j < wa) { dot += ba.getLong(16 + 8 * (i * wa + j)) *
        bb.getLong(16 + 8 * (i * wa + j)); j += 1 }
      if (dot < best) best = dot
      i += 1
    }
    best
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch_inner_product requires (BINARY, BINARY), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "sketch_inner_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchInnerProduct =
    copy(left = newLeft, right = newRight)
}
