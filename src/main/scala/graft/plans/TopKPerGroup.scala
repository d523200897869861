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
  * all survivors of a group meet in one partition. */
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
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(grp, attrs)
      val rowOrd = new LazilyGeneratedOrdering(ord, attrs)
      // max-heap under rowOrd: head = WORST of the kept k (first under
      // the ordering = best). LinkedHashMap keeps group emission order
      // deterministic per partition (insertion order).
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue() // drop the worst kept row
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, h) =>
        h.dequeueAll.reverseIterator // best-first within the group
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}
