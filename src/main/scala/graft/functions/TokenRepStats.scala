package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics over a token array, in ONE
  * array-local pass — the seventh custom Catalyst extension. Returns
  * `struct<n_tok, max_uni, n_bi, n_bi_d>` (total tokens, the highest
  * single-token occurrence count, total adjacent bigrams, distinct
  * adjacent bigrams): exactly the quantities the Gopher-style
  * repetition filter (q80, reused by the q93 pipeline) thresholds.
  *
  * WHY CUSTOM: these are WITHIN-document statistics, but the explode +
  * `groupBy(doc_id, token)` + re-`groupBy(doc_id)` form that computes
  * them declaratively shuffles the exploded token relation — four
  * full exchanges of corpus-token rows plus a join, for numbers that
  * never needed to leave the row they came from (cf.
  * `csv_to_parquet_transformer.py:1-19`'s corpus-wide pandas pass —
  * this engine's per-row form). A higher-order-function rewrite stays
  * map-side but runs interpreted (~µs per element, the measured
  * NearestCell lesson); this expression is codegen-callable (static
  * method, the [[BandedEditDistance]] pattern) and walks the array
  * once with an open HashMap of exact token identities — string
  * equality, not hashes, so counts can never collide.
  *
  * Scale shape (100 TB): turns the repetition filter into a pure
  * scan-local projection — zero shuffle at any corpus size; the map
  * is bounded by one document's distinct tokens.
  */
case class TokenRepStats(child: Expression) extends UnaryExpression {

  /** Declared non-deterministic ON PURPOSE (it is a pure function of
    * the token array): filter pushdown substitutes project aliases, so
    * a filter on any field of the result struct (q80's `n_tok > 0`,
    * q93's rep-label gate) was re-expanding this whole pass BELOW the
    * scan-rebalance Exchange — q93's pushed condition evaluated
    * token_rep_stats SIX times per row in the single-task scan stage,
    * then once more post-exchange for the projection. Marking the
    * expression non-deterministic forbids the optimizer to duplicate
    * or reorder it (the spark_optimization_guide §4.4 prescription for
    * expensive expressions), so each row pays the pass exactly once,
    * above the exchange. The blocked legitimate optimizations (filter
    * pushdown past it, constant folding) don't apply here: its
    * consumers filter only on its OUTPUT. TokenRepStatsSpec pins the
    * single-evaluation plan shape. CAVEAT for future consumers: a
    * non-deterministic expression is only legal in Project / Filter /
    * Aggregate / Window operators — placing the SQL-registered
    * token_rep_stats() directly in a join condition or as an aggregate
    * function's argument now fails CheckAnalysis; project it to a
    * column first (every current consumer already does). */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = TokenRepStats.schema
  override def prettyName: String = "token_rep_stats"

  override protected def withNewChildInternal(c: Expression)
      : TokenRepStats = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    TokenRepStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenRepStats.compute($c)")
}

object TokenRepStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("max_uni", LongType, nullable = false),
    StructField("n_bi", LongType, nullable = false),
    StructField("n_bi_d", LongType, nullable = false)))

  /** One pass: unigram counts via an exact token→(id, count) map,
    * bigram identity as the (id, id) pair of ADJACENT non-null tokens
    * — the same multiset `explode + groupBy` builds, and injective
    * because ids are exact string identities. Public + static for
    * codegen. */
  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    // token -> packed (id << 32 | count); one map gives both the count
    // and the stable per-document id used for bigram keys
    val uni = new java.util.HashMap[UTF8String, Array[Int]]()
    val bi = new java.util.HashMap[Long, Array[Int]]()
    var nTok = 0L
    var maxUni = 0L
    var nBi = 0L
    var prevId = -1
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // split() never yields nulls; mirror explode anyway (a null
        // token is its own group key) and break any bigram through it,
        // matching the concat-null-filtered bigram list
        nTok += 1
        prevId = -1
      } else {
        val t = arr.getUTF8String(i)
        var cell = uni.get(t)
        if (cell == null) {
          cell = Array(uni.size, 0)
          // copy: getUTF8String may expose a reused buffer
          uni.put(t.clone(), cell)
        }
        cell(1) += 1
        nTok += 1
        if (cell(1) > maxUni) maxUni = cell(1).toLong
        val id = cell(0)
        if (prevId >= 0) {
          val key = (prevId.toLong << 32) | (id.toLong & 0xffffffffL)
          var bc = bi.get(key)
          if (bc == null) { bc = Array(0); bi.put(key, bc) }
          bc(0) += 1
          nBi += 1
        }
        prevId = id
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, maxUni, nBi, bi.size.toLong))
  }

  def apply(toks: Column): Column =
    GraftSqlBridge.column(TokenRepStats(GraftSqlBridge.expression(toks)))

  val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("token_rep_stats"),
    new ExpressionInfo(classOf[TokenRepStats].getName, "token_rep_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "token_rep_stats takes 1 argument")
      TokenRepStats(args(0))
    })

  /** Imperative registration (idempotent) for sessions built without
    * the extensions config. */
  def register(
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : Unit = {
    val (id, info, builder) = registryEntry
    registry.registerFunction(id, info, builder)
  }
}
