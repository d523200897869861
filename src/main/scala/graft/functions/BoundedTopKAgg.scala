package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom AGGREGATE FUNCTION (the fourth Catalyst extension kind, next
  * to the codegen Expressions, the optimizer Rule, and the
  * Strategy+Exec operator): the k smallest values of a long column per
  * group, kept in a BOUNDED k-element max-heap per aggregation buffer —
  * O(k) memory however large the group, with real partial aggregation
  * (map-side combine merges heaps, so the shuffle carries at most
  * mappers·groups·k values). The window-function formulation
  * (`row_number ≤ k`) sorts every group's full contents through the
  * exchange instead.
  *
  * Returns the kept values ascending as a comma-joined string — a
  * deterministic scalar cell (duplicates included; value-equal inputs
  * produce identical output whatever their row order, so the aggregate
  * is partitioning-insensitive).
  */
case class BoundedTopKAgg(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // max-heap: head = worst kept value

  private def add(buf: mutable.PriorityQueue[Long], x: Long): Unit =
    if (buf.size < k) buf.enqueue(x)
    else if (x < buf.head) { buf.dequeue(); buf.enqueue(x) }

  override def update(buf: mutable.PriorityQueue[Long],
      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[Long],
      b2: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    UTF8String.fromString(buf.toSeq.sorted.mkString(","))

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.hasRemaining) buf.enqueue(bb.getLong)
    buf
  }

  // enforce LongType at analysis (ExpectsInputTypes is unavailable —
  // AbstractDataType is private[sql] — but checkInputDataTypes is not):
  // without this, an int/decimal column passes analysis and the
  // update() cast throws ClassCastException mid-job on an executor
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"bounded_topk requires BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : BoundedTopKAgg = copy(child = newChild)
}

object BoundedTopKAgg {
  /** DataFrame API: `.agg(BoundedTopKAgg.smallestCsv(col, k))`. */
  def smallestCsv(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      BoundedTopKAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** SQL registration: `bounded_topk(col, k)` with a foldable int k —
    * injected by [[GraftExtensions]] so the SQL front door gets the
    * aggregate too. */
  val registryEntry: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("bounded_topk"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BoundedTopKAgg].getName, "bounded_topk"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "bounded_topk takes (col, k)")
      val k = args(1) match {
        case e if e.foldable => e.eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"bounded_topk k must be a non-null integer literal, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"bounded_topk k must be a literal, got $other")
      }
      BoundedTopKAgg(args.head, k)
    })
}
