package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeEncode

/** Deterministic byte-pair-encoding tokenizer with a PINNED merge
  * table — the subword token accounting every training-data pipeline
  * budgets in (context windows, packing, mixture quotas are all
  * specified in model-tokenizer tokens, not whitespace words).
  *
  * Formulation: SentencePiece-style BPE (Kudo & Richardson 2018) —
  * NO pre-tokenization. Normalized text is a flat symbol sequence in
  * which space is an ordinary character, so learned merges may cross
  * word boundaries into phrase tokens. That is the behavior a real
  * tokenizer exhibits on this corpus: the documents table draws from a
  * ~31-word vocabulary, so word-internal merges saturate after ~90
  * rules and everything past that is word- and phrase-level structure.
  * Encoding runs the canonical iterative merge (lowest-rank adjacent
  * pair, fuse leftmost-greedy, repeat) via the codegen'd
  * [[graft.functions.BpeEncode]] expression, which carries the table
  * as one reference object — O(1) expression size in |merges|, integer
  * symbol ids in the hot loop.
  *
  * The pinned table ([[BpeMerges]]) is LEARNED from the documents
  * corpus by `runMain graft.GenBpeTable` (frequency BPE with a
  * determinism tie-break: count desc, then lexicographic) and
  * committed as an artifact, exactly as production tokenizers ship a
  * trained vocab file. For a table learned this way every rule's
  * operands are single characters or products of strictly earlier
  * rules and all products are distinct, which makes the iterative
  * encoder provably equivalent to applying the rules once each in
  * priority order — and THAT form is portable SQL: the DuckDB oracle
  * replays the identical table as batched nested `replace()` CTEs over
  * each document's marker-wrapped text ([[docTokenCtes]] — one
  * declaration, two engines, zero drift).
  */
object Bpe {

  /** Token-boundary sentinels — never occur in normalized text
    * ([a-z0-9 ] only). */
  val B = "\u0001" // token begin
  val E = "\u0002" // token end

  /** The pinned, ordered merge table (earlier = higher priority),
    * learned from the documents corpus and committed by the
    * [[graft.GenBpeTable]] generator. */
  val merges: Seq[(String, String)] = BpeMerges.table

  /** The 40-rule hand-written table the first BPE iteration pinned —
    * kept as the spec fixture for hand-computable encodings and for
    * the nested-replace ↔ iterative-encoder parity property. */
  val seedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"), ("i", "t"),
    ("i", "s"), ("in", "g"), ("a", "l"), ("e", "d"), ("l", "e"),
    ("an", "d"), ("s", "e"), ("o", "f"), ("t", "o"), ("c", "o"),
    ("m", "e"), ("d", "e"), ("h", "i"), ("u", "s"), ("l", "o"),
    ("w", "h"), ("v", "e"), ("b", "e"), ("m", "a"), ("s", "h"),
    ("p", "a"), ("c", "e"), ("f", "or"), ("wh", "ich"), ("th", "at"))

  /** The merged-out vocabulary entry each rule creates. */
  def vocab: Seq[String] = merges.map { case (a, b) => a + b }

  /** Encode normalized text into the marker representation with all
    * merges applied. Input must already be
    * [[TextAnalysis.normalizeText]]-shaped (lowercase alnum + single
    * spaces). */
  def encode(normText: Column): Column = encodeWith(normText, merges)

  /** [[encode]] against an EXPLICIT merge table. */
  def encodeWith(normText: Column, ms: Seq[(String, String)]): Column =
    BpeEncode(normText, ms)

  /** The pre-[[graft.functions.BpeEncode]] formulation — the merge
    * table compiled into |ms| stacked `replace` builtins over the
    * marker-wrapped text (every char a symbol, spaces included).
    * Correct but O(|ms|) in expression size and per-row scans; kept
    * only as the independent implementation the parity spec checks the
    * iterative encoder against. */
  private[graft] def encodeNested(normText: Column,
      ms: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(normText, "(.)", B + "$1" + E)
    ms.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(B + a + E + B + b + E), lit(B + a + b + E))
    }
  }

  /** Number of BPE tokens in the (raw) text = count of begin markers
    * after encoding. Narrow, codegen'd. */
  def tokenCount(text: Column): Column =
    tokenCountWith(text, merges)

  /** [[tokenCount]] against an EXPLICIT merge table. */
  def tokenCountWith(text: Column, ms: Seq[(String, String)]): Column = {
    val enc = encodeWith(TextAnalysis.normalizeText(text), ms)
    length(enc) - length(replace(enc, lit(B), lit("")))
  }

  /** BPE tokens as an array<string>. Tokens may contain spaces (phrase
    * merges) or BE a lone space (an unmerged boundary) — space is a
    * symbol like any other in the no-pretokenization formulation. */
  def tokens(text: Column): Column = tokensWith(text, merges)

  /** [[tokens]] against an EXPLICIT merge table. */
  def tokensWith(text: Column, ms: Seq[(String, String)]): Column = {
    val enc = encodeWith(TextAnalysis.normalizeText(text), ms)
    // strip the outer markers, split on the inter-token boundary E+B
    filter(split(regexp_replace(enc, "^" + B + "|" + E + "$", ""), E + B),
      t => t =!= "")
  }

  /** TRAIN a merge table from a corpus — the Sennrich learning loop in
    * `k` bounded passes: each pass re-encodes the corpus under the
    * merges learned so far (narrow map-side rewrite via
    * [[graft.functions.BpeEncode]]), explodes adjacent symbol pairs,
    * counts them (ONE map-side-combinable groupBy — the only shuffle
    * per pass), and the driver keeps the most frequent pair (ties to
    * lexicographically smallest — fully deterministic, no RNG). k
    * passes = k shuffles over symbol-pair rows, never corpus²; the
    * collected state per pass is ONE row.
    * Returns (left, right, pair_count) in learned order. */
  def train(docs: DataFrame, textCol: String, k: Int)
      : Seq[(String, String, Long)] = {
    require(k >= 1 && k <= 4096, "bounded training: 1..4096 merges")
    val norm = TextAnalysis.normalizeText(col(textCol))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val enc = encodeWith(norm, learned.toSeq.map(m => (m._1, m._2)))
      // per doc: symbol array; adjacent pairs via zip_with against the
      // tail slice (the q80 bigram idiom) — all array-side
      val pairs = docs
        .select(split(regexp_replace(enc, "^" + B + "|" + E + "$", ""),
          E + B).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(explode(zip_with(
          col("syms"),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(1))),
          (a, b) => when(b.isNotNull, struct(a.as("l"), b.as("r")))))
          .as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("n"))
      val top = pairs.orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) return learned.toSeq
      val r = top.head
      learned += ((r.getString(0), r.getString(1), r.getLong(2)))
    }
    learned.toSeq
  }

  /** Driver-local BPE training over a (unit, frequency) table — how
    * the pinned table is generated (training runs once, the artifact
    * ships; the corpus-sized work is only the frequency count, one
    * map-side-combinable groupBy). Units are whole normalized texts in
    * the no-pretokenization formulation. Deterministic: best pair by
    * (count desc, left asc, right asc); a candidate whose product
    * string collides with an already-created product is SKIPPED (next
    * candidate taken), which keeps the table well-formed — distinct
    * products are what make the iterative encoder equivalent to
    * sequential rule application, see [[graft.functions.BpeEncode]]. */
  def trainLocalFromCounts(unitCounts: Seq[(String, Long)], k: Int)
      : Seq[(String, String, Long)] = {
    require(k >= 1, "k >= 1")
    var units: Array[(Array[String], Long)] = unitCounts
      .filter(_._1.nonEmpty)
      .sortBy(_._1)
      .map { case (w, c) => (w.toCharArray.map(String.valueOf), c) }
      .toArray
    val products = scala.collection.mutable.HashSet.empty[String]
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var pass = 0
    var dry = false
    while (pass < k && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- units) {
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }
        .find { case ((a, b), _) => !products.contains(a + b) }
      best match {
        case None => dry = true
        case Some(((a, b), n)) =>
          products += (a + b)
          learned += ((a, b, n))
          val merged = a + b
          units = units.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  out += merged; i += 2 // greedy leftmost, no overlap
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, c)
            }
          }
      }
      pass += 1
    }
    learned.toSeq
  }

  // ---- oracle SQL generation (same declarations, DuckDB dialect) ----

  /** chr()-built sentinel concat for a marker-wrapped symbol (symbols
    * may contain spaces — the alphabet is [a-z0-9 ], so single quotes
    * never need escaping). */
  private def wrapSql(sym: String): String = s"chr(1)||'$sym'||chr(2)"

  /** CTE definitions (to splice right after `WITH`) replaying the full
    * pinned table per DOCUMENT:
    *  - `dt(doc_id, n_bpe, toks)` — every document's token count and
    *    ordered token list under the pinned merges.
    * `b0` wraps EVERY character of the normalized text (spaces
    * included) in sentinel markers; the merge chain is batched `chunk`
    * rules per CTE (nested `replace` depth stays far below DuckDB's
    * expression-depth limit, which a single 1k-deep nest would
    * exceed). Sequential rule application here equals the Spark side's
    * iterative encoder because the trained table is well-formed (see
    * [[graft.functions.BpeEncode]]). */
  def docTokenCtes(normInner: String, chunk: Int = 64): String = {
    val batches = merges.grouped(chunk).toSeq
    val chain = batches.zipWithIndex.map { case (batch, i) =>
      val e = batch.foldLeft("s") { case (s, (a, b)) =>
        s"replace($s, ${wrapSql(a)}||${wrapSql(b)}, ${wrapSql(a + b)})"
      }
      s"b${i + 1} AS (SELECT doc_id, $e AS s FROM b$i)"
    }.mkString(",\n")
    s"""b0 AS (SELECT doc_id,
       |         regexp_replace($normInner, '(.)', chr(1)||'\\1'||chr(2), 'g')
       |           AS s
       |       FROM documents),
       |$chain,
       |dt AS (SELECT doc_id,
       |         CAST(length(s) - length(replace(s, chr(1), '')) AS BIGINT)
       |           AS n_bpe,
       |         list_filter(string_split(trim(s, chr(1)||chr(2)),
       |           chr(2)||chr(1)), x -> x <> '') AS toks
       |       FROM b${batches.size})""".stripMargin
  }
}
