package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** MERGEABLE FREQUENCY SKETCHES (count-min): the heavy-hitter analog of
  * q106's HLL distinct sketches. Spark's builtin `count_min_sketch`
  * aggregate BUILDS a sketch per group but offers no SQL-level way to
  * (a) merge sketch binaries upward or (b) probe one for an item's
  * estimated count — both required for the 100 TB pattern where
  * per-partition/per-day sketches are rolled up without re-touching the
  * fact. [[CmsMergeAgg]] supplies the merge (a TypedImperativeAggregate
  * over sketch bytes — partial/final merged map-side, the shuffle
  * carries one ~`depth·width·8`-byte buffer per group per mapper) and
  * [[CmsEstimate]] the probe (deserialize-once-per-sketch scalar).
  *
  * The CMS contract this enables downstream: `estimate ≥ true` always
  * (hash collisions only ever ADD), and `estimate ≤ true + ε·N` with
  * probability 1−δ for a sketch built with relative error ε and
  * confidence 1−δ over N total increments. With a fixed seed the whole
  * pipeline is deterministic, so the bound is checkable in a test.
  */
case class CmsMergeAgg(child: Expression,
    eps: Double, confidence: Double, seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  // The empty buffer's (depth, width, seed) must equal the input
  // sketches' or mergeInPlace throws IncompatibleMergeException — the
  // ctor params exist solely to mint compatible empties, so pass the
  // SAME (eps, confidence, seed) used at count_min_sketch build time.
  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeInPlace(CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    b1.mergeInPlace(b2)

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_merge requires BINARY sketch input, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge"

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** `cms_estimate(sketch, item)` — the estimated count of `item` (a
  * BIGINT) in a serialized count-min sketch. Deserialization is cached
  * per distinct byte array (reference identity), so probing k items
  * against one broadcast/crossed sketch cell parses it once, not k
  * times. Probe-side only — runs over dimension-sized key lists, never
  * the fact — so CodegenFallback costs nothing measurable.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || (cachedBytes ne bytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(item.asInstanceOf[Long])
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires (BINARY, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsSketch {
  /** DataFrame API: merge a column of serialized sketches built with
    * the same (eps, confidence, seed). */
  def merge(c: Column, eps: Double, confidence: Double, seed: Int): Column =
    GraftSqlBridge.column(
      CmsMergeAgg(GraftSqlBridge.expression(c), eps, confidence, seed)
        .toAggregateExpression())

  /** DataFrame API: probe a serialized sketch for a BIGINT item. */
  def estimate(sketch: Column, item: Column): Column =
    GraftSqlBridge.column(CmsEstimate(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(item)))

  private def litNum(e: Expression, what: String): Double = e match {
    case l if l.foldable => l.eval() match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"cms_merge $what must be a non-null numeric literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"cms_merge $what must be a literal, got $other")
  }

  /** SQL registration: `cms_merge(sketch, eps, confidence, seed)` with
    * foldable numeric params — injected by [[GraftExtensions]]. */
  val mergeRegistryEntry: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("cms_merge"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CmsMergeAgg].getName, "cms_merge"),
    (args: Seq[Expression]) => {
      require(args.length == 4, "cms_merge takes (sketch, eps, confidence, seed)")
      CmsMergeAgg(args.head, litNum(args(1), "eps"),
        litNum(args(2), "confidence"), litNum(args(3), "seed").toInt)
    })

  /** SQL registration: `cms_estimate(sketch, item)`. */
  val estimateRegistryEntry: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("cms_estimate"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CmsEstimate].getName, "cms_estimate"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cms_estimate takes (sketch, item)")
      CmsEstimate(args.head, args(1))
    })

  /** Imperative registration for sessions built without the
    * spark.sql.extensions config (mirrors CosineScaled.register). */
  def register(registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : Unit = {
    Seq(mergeRegistryEntry, estimateRegistryEntry).foreach {
      case (id, info, builder) => registry.registerFunction(id, info, builder)
    }
  }
}
