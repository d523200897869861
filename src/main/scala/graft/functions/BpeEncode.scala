package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode against an arbitrary merge table — the scale path past
  * the nested-`replace` formulation, which compiles the merge table
  * into |merges| stacked string rewrites and cannot reach a real
  * 1k–100k-rule vocabulary (each rule re-scans the whole string; the
  * expression tree itself grows linearly with the table).
  *
  * This expression carries the table as ONE reference object — O(1)
  * expression size in |merges| — and runs the canonical iterative
  * encoder over the WHOLE normalized text (no pre-tokenization: space
  * is an ordinary symbol, so learned merges may cross word boundaries,
  * the SentencePiece-BPE formulation of Kudo & Richardson 2018): find
  * the adjacent symbol pair with the lowest merge rank, fuse all its
  * occurrences leftmost-greedy, repeat until no pair is in the table.
  *
  * For a WELL-FORMED table — every rule's operands are single
  * characters or products of strictly earlier rules, and products are
  * distinct — this is provably equivalent to applying the rules once
  * each in priority order (a later rule can never newly enable an
  * earlier one, because it would have to create one of the earlier
  * rule's operands, and distinct products pin each operand to its
  * unique, earlier creator). [[graft.ops.Bpe.trainLocalFromCounts]]
  * enforces well-formedness; PropertySpec checks the equivalence
  * against a direct sequential fold on arbitrary text. A rule whose
  * operand is neither a single character nor the product of an
  * EARLIER rule can never fire under sequential semantics (the symbol
  * cannot exist when the rule runs) — the table build drops it, which
  * keeps the two formulations aligned even for hand-written tables.
  *
  * Output is the marker representation the rest of the BPE surface
  * consumes (every token wrapped B+tok+E) — drop-in for the
  * nested-replace encoder.
  *
  * Scale: stays inside whole-stage codegen (the generated code calls
  * [[BpeEncode.Table.encodeText]] — the same shape Spark's own
  * regexp expressions compile to). The hot loop works on interned
  * integer symbol ids (a char IS its id; rule i's product is 65536+i,
  * unique because products are distinct) with an open-addressed
  * long→int rank table — no string hashing or allocation per probe.
  * Per-row cost is O(len × merges_fired), independent of table size:
  * a 100k-rule vocabulary costs the same scan as a 1k-rule one. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  /** Don't dump the merge table into plan/explain text — the table is
    * payload, not plan structure (a 100k-rule vocabulary would bloat
    * every explain to megabytes). */
  override def toString: String =
    s"bpe_encode($child, ${merges.length} merges)"

  @transient private lazy val table = new BpeEncode.Table(merges)

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    table.encodeText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.Table].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
  }
}

object BpeEncode {

  /** Token-boundary sentinels — never occur in normalized text. */
  val B = '\u0001'
  val E = '\u0002'

  private val PROD0 = 0x10000 // first product id (chars own 0..0xFFFF)

  /** Rank-indexed merge table over interned symbol ids. One instance
    * per expression, shipped to executors as a codegen reference
    * object; only the raw pairs serialize, the id structures rebuild
    * lazily per JVM (lazy val init is synchronized — thread-safe). */
  final class Table(mergeList: Seq[(String, String)]) extends Serializable {

    private val pairs: Array[(String, String)] = mergeList.toArray

    // ---- derived, per-JVM ----

    /** product string of rule i. */
    @transient private lazy val prodStr: Array[String] =
      pairs.map { case (a, b) => a + b }

    /** canonical id of each product string (first creator wins — a
      * duplicate later product could never fire sequentially). */
    @transient private lazy val prodId: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        m.putIfAbsent(prodStr(i), Integer.valueOf(PROD0 + i))
        i += 1
      }
      m
    }

    /** open-addressed (leftId, rightId) → rank; keys stored +1 so 0 is
      * the empty slot. Also memoizes, per rule, the canonical id its
      * merge produces. */
    @transient private lazy val rankTable: RankTable = {
      val t = new RankTable(pairs.length)
      var i = 0
      while (i < pairs.length) {
        val l = operandId(pairs(i)._1, i)
        val r = operandId(pairs(i)._2, i)
        if (l >= 0 && r >= 0)
          t.putIfAbsent(l, r, i, prodId.get(prodStr(i)).intValue())
        i += 1
      }
      t
    }

    /** id of an operand as seen by rule `rule`: its char code if a
      * single character, else the product of a STRICTLY EARLIER rule;
      * -1 marks the rule unfirable (operand can never exist). */
    private def operandId(s: String, rule: Int): Int =
      if (s.length == 1) s.charAt(0).toInt
      else {
        val p = prodId.get(s)
        if (p != null && p.intValue() - PROD0 < rule) p.intValue() else -1
      }

    /** Whole-text encode into the marker representation. */
    def encodeText(s: UTF8String): UTF8String = {
      val text = s.toString
      val n = text.length
      if (n == 0) return UTF8String.EMPTY_UTF8
      val rt = rankTable // force init outside the loop
      val ids = new Array[Int](n)
      var i = 0
      while (i < n) { ids(i) = text.charAt(i).toInt; i += 1 }
      var size = n
      var exhausted = size < 2
      while (!exhausted) {
        // lowest-rank adjacent pair this round
        var bestRank = Int.MaxValue
        var bestL = -1
        var bestR = -1
        var bestMerged = -1
        var j = 0
        while (j < size - 1) {
          val r = rt.rank(ids(j), ids(j + 1))
          if (r >= 0 && r < bestRank) {
            bestRank = r
            bestL = ids(j); bestR = ids(j + 1)
            bestMerged = rt.mergedOf(r)
          }
          j += 1
        }
        if (bestL < 0) exhausted = true
        else {
          // fuse all occurrences, greedy leftmost, in place
          var w = 0
          var rd = 0
          while (rd < size) {
            if (rd + 1 < size && ids(rd) == bestL && ids(rd + 1) == bestR) {
              ids(w) = bestMerged; rd += 2
            } else { ids(w) = ids(rd); rd += 1 }
            w += 1
          }
          size = w
          exhausted = size < 2
        }
      }
      val sb = new java.lang.StringBuilder(n * 3)
      var m = 0
      while (m < size) {
        val id = ids(m)
        sb.append(B)
        if (id < PROD0) sb.append(id.toChar) else sb.append(prodStr(id - PROD0))
        sb.append(E)
        m += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Minimal open-addressed long→(rank, mergedId) map: power-of-2
    * linear probing, zero allocation per lookup. */
  private final class RankTable(n: Int) {
    private val cap: Int = {
      var c = 16
      while (c < n * 4) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap) // key+1; 0 = empty
    private val ranks = new Array[Int](cap)
    private val merged = new Array[Int](n.max(1))

    @inline private def pack(l: Int, r: Int): Long =
      (l.toLong << 32) | (r.toLong & 0xffffffffL)

    @inline private def slot(key: Long): Int =
      (((key * 0x9e3779b97f4a7c15L) >>> 40).toInt) & mask

    def putIfAbsent(l: Int, r: Int, rank: Int, mergedId: Int): Unit = {
      val key = pack(l, r) + 1
      var h = slot(key)
      while (keys(h) != 0L && keys(h) != key) h = (h + 1) & mask
      if (keys(h) == 0L) { // first (highest-priority) rule wins
        keys(h) = key
        ranks(h) = rank
      }
      merged(rank) = mergedId
    }

    def rank(l: Int, r: Int): Int = {
      val key = pack(l, r) + 1
      var h = slot(key)
      var k = keys(h)
      while (k != 0L) {
        if (k == key) return ranks(h)
        h = (h + 1) & mask
        k = keys(h)
      }
      -1
    }

    def mergedOf(rank: Int): Int = merged(rank)
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(c), merges))
}
