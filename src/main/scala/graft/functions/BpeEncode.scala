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

  /** Row length at which encode switches from the round-scan merge to
    * the heap merge — below it the scan's constants win, above it the
    * O(n log n) bound does. */
  private[graft] val HeapThreshold = 2048

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

    /** Whole-text encode into the marker representation. Short rows
      * take the round-scan path (best constants at typical document
      * lengths); rows past [[BpeEncode.HeapThreshold]] take the
      * linked-list + min-heap path — O(n log n) worst case instead of
      * O(len × rules_fired), which is what keeps the book-length tail
      * of a 100 TB corpus's length distribution from going quadratic.
      * Both paths implement the identical iterative semantics
      * (lowest rank first, leftmost first within a rank) — a heap
      * entry is (rank, position) packed into one long, so heap order
      * IS that order, and a merge can never create a new occurrence
      * of the same rank (new pairs always involve the freshly-created
      * product symbol, which belongs to different rules). */
    def encodeText(s: UTF8String): UTF8String = {
      val text = s.toString
      val n = text.length
      if (n == 0) return UTF8String.EMPTY_UTF8
      encodeTextForced(text, n >= BpeEncode.HeapThreshold)
    }

    /** Path-forced encode — the dispatch in [[encodeText]] is a pure
      * performance choice, and the specs pin the two paths equal. */
    private[graft] def encodeTextForced(text: String, heap: Boolean)
        : UTF8String = {
      val n = text.length
      if (n == 0) return UTF8String.EMPTY_UTF8
      val rt = rankTable // force init outside the loop
      val ids = new Array[Int](n)
      var i = 0
      while (i < n) { ids(i) = text.charAt(i).toInt; i += 1 }
      val size = if (heap) mergeHeap(ids, n, rt) else mergeRounds(ids, n, rt)
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

    /** Round-scan merge: find the globally lowest-rank adjacent pair,
      * fuse all its occurrences leftmost-greedy, repeat. In-place on
      * `ids`; returns the final symbol count. O(len × rules_fired). */
    private def mergeRounds(ids: Array[Int], n: Int, rt: RankTable): Int = {
      var size = n
      var exhausted = size < 2
      while (!exhausted) {
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
      size
    }

    /** Heap merge: doubly-linked symbol list + a long-packed min-heap
      * of (rank << 32 | leftPos) candidates. Stale entries (left node
      * dead, or the pair at that position no longer matches the
      * popped rank) are skipped on pop; a successful merge keeps the
      * LEFT node (positions never reorder, so position order stays
      * leftmost order) and pushes at most two new candidates. Each of
      * the ≤ n merges pushes O(1) entries → O(n log n) total. The
      * rank re-check on pop is also the correctness test: whenever it
      * passes, the pair at that position IS the popped rule, so even
      * an entry that became stale and "coincidentally" revalidated
      * merges correctly. In-place compaction; returns final count. */
    private def mergeHeap(ids: Array[Int], n: Int, rt: RankTable): Int = {
      val prev = new Array[Int](n)
      val next = new Array[Int](n)
      val alive = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        prev(i) = i - 1; next(i) = i + 1; alive(i) = true; i += 1
      }
      var heap = new Array[Long](math.max(16, n))
      var hs = 0
      def push(v: Long): Unit = {
        if (hs == heap.length)
          heap = java.util.Arrays.copyOf(heap, heap.length * 2)
        heap(hs) = v
        var c = hs
        hs += 1
        while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
          val p = (c - 1) >> 1
          val t = heap(p); heap(p) = heap(c); heap(c) = t
          c = p
        }
      }
      def pop(): Long = {
        val top = heap(0)
        hs -= 1
        heap(0) = heap(hs)
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1
          val r = l + 1
          var m = c
          if (l < hs && heap(l) < heap(m)) m = l
          if (r < hs && heap(r) < heap(m)) m = r
          if (m == c) done = true
          else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
        }
        top
      }
      i = 0
      while (i < n - 1) {
        val r = rt.rank(ids(i), ids(i + 1))
        if (r >= 0) push(r.toLong << 32 | i)
        i += 1
      }
      while (hs > 0) {
        val top = pop()
        val rank = (top >>> 32).toInt
        val p = (top & 0xffffffffL).toInt
        if (alive(p)) {
          val q = next(p)
          if (q < n && rt.rank(ids(p), ids(q)) == rank) {
            ids(p) = rt.mergedOf(rank)
            alive(q) = false
            val qq = next(q)
            next(p) = qq
            if (qq < n) prev(qq) = p
            val pp = prev(p)
            if (pp >= 0) {
              val r2 = rt.rank(ids(pp), ids(p))
              if (r2 >= 0) push(r2.toLong << 32 | pp)
            }
            if (qq < n) {
              val r3 = rt.rank(ids(p), ids(qq))
              if (r3 >= 0) push(r3.toLong << 32 | p)
            }
          }
        }
      }
      var w = 0
      var c = 0
      while (c < n) {
        if (alive(c)) { ids(w) = ids(c); w += 1 }
        c += 1
      }
      w
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
