package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer with a PINNED merge
  * table — the subword token accounting every training-data pipeline
  * budgets in (context windows, packing, mixture quotas are all
  * specified in model-tokenizer tokens, not whitespace words).
  *
  * Algorithm (Sennrich et al. 2016 "apply the learned operations in the
  * order they were learned"): text is normalized, every non-space
  * character c is wrapped in sentinel markers as `c`, and
  * each merge rule (a, b) → ab is ONE literal string replace of
  * `ab` with `ab`, applied in merge
  * priority order. The wrapping makes token boundaries explicit in the
  * string itself, so:
  *  - a rule can never match INSIDE a longer token ((b,c) never fires
  *    on the token "ab" followed by token "c" — the intervening markers
  *    don't line up);
  *  - adjacent occurrences share no characters, so the engine's
  *    leftmost non-overlapping `replace` IS the greedy left-to-right
  *    merge ("aaa" under (a,a)→aa becomes [aa, a]);
  *  - spaces are hard word boundaries (never wrapped, never merged).
  *
  * Everything is codegen'd builtins (regexp_replace + a fold of
  * replaces) — no UDF, map-side at scan speed, and the EXACT same
  * rewrite is replayable in portable SQL (the oracle generates nested
  * `replace(..., chr(1)||'a'||chr(2)||..., ...)` from this same merge
  * table — one declaration, two engines, zero drift).
  *
  * The merge table is literal and ordered: 40 merges with the shape a
  * trained English BPE vocabulary has (common character bigrams first,
  * derived symbols on the left of later rules) — the exact pairs matter
  * less than both engines sharing them verbatim.
  */
object Bpe {

  /** Token-boundary sentinels — never occur in normalized text
    * ([a-z0-9 ] only). */
  val B = "\u0001" // token begin
  val E = "\u0002" // token end

  /** The pinned, ordered merge table. Earlier = higher priority.
    * Derived symbols (e.g. "th") appear on the left of later rules,
    * exactly like a trained BPE vocabulary. */
  val merges: Seq[(String, String)] = Seq(
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
  def encode(normText: Column): Column = {
    val wrapped = regexp_replace(normText, "([^ ])", B + "$1" + E)
    merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(B + a + E + B + b + E), lit(B + a + b + E))
    }
  }

  /** Number of BPE tokens in the (raw) text = count of begin markers
    * after encoding. Narrow, codegen'd, O(merges · len) per row. */
  def tokenCount(text: Column): Column = {
    val enc = encode(TextAnalysis.normalizeText(text))
    length(enc) - length(replace(enc, lit(B), lit("")))
  }

  /** BPE tokens as an array<string> (spaces dropped — they are word
    * boundaries, not tokens). */
  def tokens(text: Column): Column = {
    val enc = replace(encode(TextAnalysis.normalizeText(text)),
      lit(" "), lit(""))
    // strip the outer markers, split on the inter-token boundary E+B
    filter(split(regexp_replace(enc, "^" + B + "|" + E + "$", ""), E + B),
      t => t =!= "")
  }

  /** Encode against an EXPLICIT merge list (training uses the partial
    * lists; [[encode]] is this at `merges`). */
  private def encodeWith(normText: Column,
      ms: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(normText, "([^ ])", B + "$1" + E)
    ms.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(B + a + E + B + b + E), lit(B + a + b + E))
    }
  }

  /** TRAIN a merge table from a corpus — the Sennrich learning loop in
    * `k` bounded passes: each pass re-encodes the corpus under the
    * merges learned so far (narrow map-side rewrite), explodes
    * adjacent symbol pairs, counts them (ONE map-side-combinable
    * groupBy — the only shuffle per pass), and the driver keeps the
    * most frequent pair (ties to lexicographically smallest — fully
    * deterministic, no RNG). k passes = k shuffles over symbol-pair
    * rows, never corpus²; the collected state per pass is ONE row.
    * Returns (left, right, pair_count) in learned order — feed it to
    * [[encodeWith]]-shaped appliers or pin it as the static table. */
  def train(docs: DataFrame, textCol: String, k: Int)
      : Seq[(String, String, Long)] = {
    require(k >= 1 && k <= 200, "bounded training: 1..200 merges")
    val norm = TextAnalysis.normalizeText(col(textCol))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val enc = encodeWith(norm, learned.toSeq.map(m => (m._1, m._2)))
      // per word: symbol array; adjacent pairs via zip_with against the
      // tail slice (the q80 bigram idiom) — all array-side
      val pairs = docs.select(
          explode(split(enc, " ")).as("w"))
        .select(split(regexp_replace(col("w"), "^" + B + "|" + E + "$", ""),
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

  // ---- oracle SQL generation (same declarations, DuckDB dialect) ----

  /** chr()-built sentinel concat for a marker-wrapped symbol. */
  private def wrapSql(sym: String): String = s"chr(1)||'$sym'||chr(2)"

  /** Nested replace() applying the full merge table to `inner` (an SQL
    * expression producing normalized text). Mirrors [[encode]]. */
  def encodeSql(inner: String): String = {
    val wrapped =
      s"regexp_replace($inner, '([^ ])', chr(1)||'\\1'||chr(2), 'g')"
    merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s"replace($s, ${wrapSql(a)}||${wrapSql(b)}, ${wrapSql(a + b)})"
    }
  }

  /** SQL for the BPE token count over `normInner` (an SQL expression
    * producing normalized text). Mirrors [[tokenCount]]. */
  def tokenCountSql(normInner: String): String = {
    val enc = encodeSql(normInner)
    s"(length($enc) - length(replace($enc, chr(1), '')))"
  }
}
