package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein distance specialized for the fuzzy-match
  * hot path: returns the EXACT distance when it is ≤ `k`, and any
  * value > k (k+1) otherwise — the contract a `dist BETWEEN 0 AND k`
  * filter needs, identical to the builtin 3-arg `levenshtein`'s
  * observable behavior under that filter.
  *
  * WHY CUSTOM: the builtin runs a general UTF-8-aware DP per call; on
  * a blocked self-join it executes once per CANDIDATE PAIR — the
  * single hottest scalar in the engine (q44: ~1M calls at sf0.1).
  * This expression takes the Ukkonen band (width 2k+1) over raw bytes
  * when both inputs are pure ASCII (byte distance == char distance
  * there), with two thread-local reusable band rows — zero per-call
  * allocation — and an early exit the moment the band minimum exceeds
  * k. Non-ASCII inputs fall back to the builtin's UTF8String
  * implementation, so semantics never change, only speed.
  */
case class BandedEditDistance(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0 && k <= 16, "banded edit distance supports 0 <= k <= 16")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "banded_edit_distance"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandedEditDistance =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    BandedEditDistance.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BandedEditDistance.dist($a, $b, $k)")
}

object BandedEditDistance {

  // two reusable DP rows per thread — the band never exceeds 2k+2
  // cells, but sizing to a fixed 64 covers every admissible k
  private val rowA = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](64))
  private val rowB = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](64))

  /** Exact distance if ≤ k, else k+1. Public + static for codegen. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    // byte DP == char DP only for pure ASCII; otherwise defer to the
    // builtin's UTF-8-aware implementation
    var i = 0
    while (i < ab.length) { if (ab(i) < 0) return fallback(a, b, k); i += 1 }
    i = 0
    while (i < bb.length) { if (bb(i) < 0) return fallback(a, b, k); i += 1 }
    // strip the common prefix and suffix before banding (r18): edit
    // distance is invariant to shared ends, and real-world match keys
    // (ids, URLs, "Customer#000…" names) share long prefixes — the
    // O(len) scans replace O(len·k) band cells. ASCII-only here, so
    // byte equality is character equality.
    var p = 0
    val maxP = math.min(ab.length, bb.length)
    while (p < maxP && ab(p) == bb(p)) p += 1
    var ea = ab.length
    var eb = bb.length
    while (ea > p && eb > p && ab(ea - 1) == bb(eb - 1)) { ea -= 1; eb -= 1 }
    asciiBanded(ab, p, ea - p, bb, p, eb - p, k)
  }

  private def fallback(a: UTF8String, b: UTF8String, k: Int): Int = {
    val d = a.levenshteinDistance(b, k)
    if (d < 0 || d > k) k + 1 else d
  }

  /** Ukkonen banded DP over byte-array SLICES (`aOff`/`bOff` +
    * lengths `n`/`m` — the post-strip windows): only cells with
    * |i - j| ≤ k are reachable within distance k. */
  private def asciiBanded(a: Array[Byte], aOff: Int, n: Int,
      b: Array[Byte], bOff: Int, m: Int, k: Int): Int = {
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return if (m > k) k + 1 else m
    if (m == 0) return if (n > k) k + 1 else n
    val big = k + 1
    var prev = rowA.get()
    var cur = rowB.get()
    // prev(j - lo + 1) holds row i-1's cost at column j; band is
    // j in [i - k, i + k] clamped to [0, m]
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      // cur indexed by j - (lo - 1); cell 0 = column lo-1 boundary
      cur(0) = if (lo == 1) i else big
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val cost = if (a(aOff + i - 1) == b(bOff + j - 1)) 0 else 1
        // prev row band was [i-1-k, i-1+k]; prev index of column j is
        // j - (max(1, i-1-k) - 1); compute via offsets
        val prevLo = math.max(1, i - 1 - k)
        val diag = if (j - 1 >= prevLo - 1 && j - 1 <= math.min(m, i - 1 + k))
          prev(j - 1 - (prevLo - 1)) else big
        val up = if (j >= prevLo - 1 && j <= math.min(m, i - 1 + k))
          prev(j - (prevLo - 1)) else big
        val leftC = cur(j - lo)
        var v = math.min(diag + cost, math.min(up + 1, leftC + 1))
        if (v > big) v = big
        cur(j - lo + 1) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return big // no path within the band can recover
      val t = prev; prev = cur; cur = t
      // prev now holds row i with band starting at lo - 1; normalize
      // next iteration's expectations by shifting semantics: we store
      // row i's values at indices (j - (lo - 1)); the next row reads
      // via its own prevLo arithmetic, which matches this layout.
      i += 1
    }
    val lastLo = math.max(1, n - k)
    val idx = m - (lastLo - 1)
    val d = if (idx >= 0 && idx < 64) prev(idx) else big
    if (d > k) big else d
  }

  def apply(a: Column, b: Column, k: Int): Column =
    GraftSqlBridge.column(BandedEditDistance(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), k))
}
