package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TOP-K PER GROUP as a first-class operator — the whole-operator
  * custom-plan path (logical node → Strategy → physical exec), the one
  * Catalyst surface the expression/optimizer-rule work didn't cover.
  *
  * Why not `row_number().over(window) <= k`? The window formulation
  * SORTS every group in full — O(n log n) per group and a full
  * materialized sort per partition — to keep k rows. This operator keeps
  * a bounded heap of k rows per group: O(n log k), no sort, and (like
  * partial aggregation) a map-side PARTIAL pass trims every input
  * partition to ≤ k rows per group BEFORE the shuffle, so the exchange
  * moves at most mappers·groups·k rows no matter how large the fact is.
  * Top-k is algebraic: topK(topK(a) ∪ topK(b)) = topK(a ∪ b), which is
  * exactly the partial/final split below.
  *
  * Semantics: the k FIRST rows of each group under `ordering`
  * (lexicographic over the SortOrder seq). Callers must make the
  * ordering a TOTAL order (include a tiebreak column) for deterministic
  * results — same contract as any top-k.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}

object TopKPerGroup {

  /** DataFrame API: top `k` rows per `groupCols` group, first under
    * `orderCols` (build direction via .desc/.asc; include a tiebreaker
    * for a total order). Registers the strategy on the session
    * (idempotent).
    *
    * Resolution trick: rather than hand-converting Column ASTs, build a
    * `repartition(group).sortWithinPartitions(order)` PROBE plan, let
    * the ANALYZER resolve it, then splice its resolved partition and
    * sort expressions into the custom node over the same child — the
    * custom operator literally replaces the repartition+sort pair it is
    * semantically a bounded version of. */
  def apply(df: DataFrame, k: Int, groupCols: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(
        _.isInstanceOf[TopKStrategy.type]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val probe = df.repartition(groupCols: _*)
      .sortWithinPartitions(orderCols: _*)
    GraftSqlBridge.plan(probe) match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(order, false,
          r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression,
          _) =>
        GraftSqlBridge.ofRows(spark,
          TopKPerGroup(k, r.partitionExpressions, order, r.child))
      case other => throw new IllegalStateException(
        s"unexpected probe plan shape:\n$other")
    }
  }
}

/** Planner strategy: logical TopKPerGroup → partial exec (map-side trim,
  * no distribution requirement) under a final exec (requires clustering
  * on the group keys — Spark inserts the exchange). */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, ord, child) =>
      TopKPerGroupExec(k, g, ord, partial = false,
        TopKPerGroupExec(k, g, ord, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass: ≤ k rows per group survive, emitted best-first
  * per group. `partial = true` runs on whatever partitioning the child
  * has (map-side trim); the final pass declares ClusteredDistribution so
  * all survivors of a group meet in one partition.
  *
  * Memory contract: each pass holds one ≤k-row heap per distinct group
  * key IN ITS PARTITION, on heap, no spill. The PARTIAL pass bounds the
  * map at [[TopKPerGroupExec.maxPartialGroups]] heaps — once a mapper
  * has seen that many distinct keys, rows of further NEW keys pass
  * through untrimmed (correct: pass-through only forgoes the trim; the
  * final pass still bounds every group to k), so a pathological
  * groups≈rows input degrades to a plain shuffle instead of an OOM.
  * The FINAL pass cannot pass through (its output IS the answer); its
  * footprint is (total groups / shuffle partitions)·k rows per task —
  * for extreme group cardinality × k budgets, prefer the sort-spilling
  * `row_number().over(window)` formulation instead. */
case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val grp = groupExprs
    val ord = ordering
    val attrs = child.output
    val isPartial = partial
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(grp, attrs)
      val rowOrd = new LazilyGeneratedOrdering(ord, attrs)
      // max-heap under rowOrd: head = WORST of the kept k (first under
      // the ordering = best). LinkedHashMap keeps group emission order
      // deterministic per partition (insertion order).
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      new Iterator[InternalRow] {
        private var passRow: InternalRow = null
        private var tail: Iterator[InternalRow] = null
        private def advance(): Unit = {
          while (passRow == null && tail == null) {
            if (!it.hasNext) {
              tail = heaps.iterator.flatMap { case (_, h) =>
                h.dequeueAll.reverseIterator // best-first within the group
              }
            } else {
              val row = it.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kLocal) heap.enqueue(row.copy())
                  else if (rowOrd.compare(row, heap.head) < 0) {
                    heap.dequeue() // drop the worst kept row
                    heap.enqueue(row.copy())
                  }
                case None
                    if isPartial &&
                      heaps.size >= TopKPerGroupExec.maxPartialGroups =>
                  // map bounded: new keys pass through untrimmed
                  passRow = row
                case None =>
                  val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
                  heaps.put(key.copy(), h)
                  if (h.size < kLocal) h.enqueue(row.copy())
              }
            }
          }
        }
        override def hasNext: Boolean = {
          advance()
          passRow != null || tail.hasNext
        }
        override def next(): InternalRow = {
          advance()
          if (passRow != null) { val r = passRow; passRow = null; r }
          else tail.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-pass map bound: 2^20 groups × k row copies per mapper is a
    * few hundred MB at typical k, well under executor memory; beyond it
    * the trim stops paying for itself anyway (groups ≈ rows). */
  val maxPartialGroups: Int = 1 << 20
}
