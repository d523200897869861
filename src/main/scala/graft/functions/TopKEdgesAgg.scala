package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Deduplicating bounded top-k EDGE aggregate — the sixth custom
  * Catalyst extension ([[graft.ops.KnnGraph]]'s per-node neighbor
  * ranking as ONE aggregation): per group, the k best (cosine, v)
  * pairs by (cosine DESC NULLS LAST, v ASC), duplicate (cosine, v)
  * pairs counted once, kept in an O(k) ordered buffer with real
  * partial aggregation.
  *
  * WHY CUSTOM (measured r17, DriverFloorProbe): every kNN-graph round
  * ranked its candidate edges through TWO exchanges —
  * `distinct()` (dedup across the union of fresh candidates and the
  * carried graph) and a `row_number` window (rank, keep ≤ k). Both
  * shuffle the FULL candidate relation (N·(2k)² rows per refinement
  * round), and under AQE each exchange is a separately-materialized
  * query stage — at small N the build's wall is almost entirely this
  * per-stage driver loop (q164: 26 jobs, 46 tasks, ideal compute
  * 0.1 s of a 2.4 s wall). Folded into one aggregate, the round pays
  * ONE exchange whose map-side partials carry at most k entries per
  * (mapper, node) — a ~(2k)²/k shuffle-volume cut at any scale — and
  * the dedup is a buffer membership test instead of a shuffle.
  *
  * Bit-identity with the `distinct() + row_number ≤ k` form
  * (KnnGraphSpec property-pins it): the buffer is an ordered set
  * keyed by EXACTLY the window's sort key (cosine desc nulls-last,
  * v asc) with (cosine, v) as the element identity — a duplicate
  * insert is a no-op wherever it lands, ties keep the smaller v, a
  * NULL cosine ranks after every non-null (kept only when fewer than
  * k non-null candidates exist, exactly like the window). The
  * internal graph path only ever feeds [[CosineScaled]] outputs
  * (finite; +0.0 only), but `topk_edges` is registered session-wide,
  * so the comparator is a TOTAL order over arbitrary doubles
  * (ADVICE r17): NaN compares largest (first under DESC) via
  * `java.lang.Double.compare`, exactly Spark's sort order, and -0.0
  * is normalized to +0.0 at intake so the dedup identity matches
  * Spark's normalized-float equality (`distinct()` treats them
  * equal).
  *
  * Returns `array<struct<v bigint, cosine double>>` in rank order —
  * deterministic under ANY partitioning (set semantics + total
  * order), so oracle replays stay hash-exact.
  */
case class TopKEdgesAgg(left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[TopKEdgesAgg.Edge]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  // left = v (BIGINT), right = cosine (DOUBLE)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT v, DOUBLE cosine), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def createAggregationBuffer(): java.util.TreeSet[TopKEdgesAgg.Edge] =
    new java.util.TreeSet[TopKEdgesAgg.Edge]()

  private def add(buf: java.util.TreeSet[TopKEdgesAgg.Edge],
      e: TopKEdgesAgg.Edge): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (e.compareTo(buf.last()) < 0) {
      // strictly better than the current kth: admit, evict the last.
      // compareTo == 0 means e IS the kth (same cosine AND v) — a
      // duplicate, already present; > 0 means worse — both skip.
      if (buf.add(e)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[TopKEdgesAgg.Edge],
      input: InternalRow): java.util.TreeSet[TopKEdgesAgg.Edge] = {
    val v = left.eval(input)
    if (v != null) { // a NULL v cannot be an edge endpoint; window rows
      val c = right.eval(input) // with null v never survive the join
      val cd = if (c == null) 0d else c.asInstanceOf[Double]
      add(buf, TopKEdgesAgg.Edge(c == null,
        if (cd == 0d) 0d else cd, // -0.0 → +0.0: Spark-equal, one key
        v.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[TopKEdgesAgg.Edge],
      b2: java.util.TreeSet[TopKEdgesAgg.Edge])
      : java.util.TreeSet[TopKEdgesAgg.Edge] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[TopKEdgesAgg.Edge]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.v, if (e.cosNull) null else e.cos))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[TopKEdgesAgg.Edge])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(17 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.put(if (e.cosNull) 1.toByte else 0.toByte)
      bb.putDouble(e.cos)
      bb.putLong(e.v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[TopKEdgesAgg.Edge] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.hasRemaining)
      buf.add(TopKEdgesAgg.Edge(bb.get() == 1, bb.getDouble(), bb.getLong()))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_edges"

  override def withNewMutableAggBufferOffset(o: Int): TopKEdgesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKEdgesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKEdgesAgg =
    copy(left = newLeft, right = newRight)
}

object TopKEdgesAgg {

  /** One kept edge. Natural order = the window form's sort key:
    * cosine DESC with NULLs last, then v ASC; equality ⇔ same
    * (cosine, v) — the dedup identity `distinct()` used. TOTAL over
    * arbitrary doubles (ADVICE r17 — the primitive <,> form was
    * intransitive for NaN): `java.lang.Double.compare` ranks NaN
    * largest (first under DESC, Spark's sort order); -0.0 never
    * reaches the buffer (normalized at update intake; serialized
    * buffers only ever contain normalized values). */
  final case class Edge(cosNull: Boolean, cos: Double, v: Long)
    extends Comparable[Edge] {
    override def compareTo(o: Edge): Int =
      if (cosNull != o.cosNull) { if (cosNull) 1 else -1 } // nulls last
      else {
        val c = java.lang.Double.compare(o.cos, cos) // larger cosine first
        if (c != 0) c
        else java.lang.Long.compare(v, o.v) // ties: smaller v first
      }
  }

  /** DataFrame API: `.agg(TopKEdgesAgg.edges(col("v"), col("cosine"), k))`
    * → `array<struct<v, cosine>>` in rank order. */
  def edges(v: Column, cosine: Column, k: Int): Column =
    GraftSqlBridge.column(TopKEdgesAgg(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(cosine), k)
      .toAggregateExpression())

  /** SQL registration: `topk_edges(v, cosine, k)` with a foldable int
    * k — injected by [[GraftExtensions]] like the other extensions. */
  val registryEntry: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("topk_edges"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopKEdgesAgg].getName, "topk_edges"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "topk_edges takes (v, cosine, k)")
      val k = args(2) match {
        case e if e.foldable => e.eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"topk_edges k must be a non-null integer literal, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"topk_edges k must be a literal, got $other")
      }
      TopKEdgesAgg(args(0), args(1), k)
    })
}
