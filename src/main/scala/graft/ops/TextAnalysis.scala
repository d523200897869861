package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting), all built from codegen'd Spark builtins — no UDFs —
  * so whole-stage codegen keeps the scan → score pipeline in one stage.
  *
  * Every function here is expressible in portable ANSI-ish SQL (the
  * DuckDB oracles recompute them verbatim): hashing goes through md5 hex
  * (identical across engines) instead of engine-native hash functions,
  * and occurrence counting uses length/replace arithmetic instead of
  * engine-specific matchers.
  *
  * Scale: all per-row narrow transforms — no shuffle; at 100 TB these run
  * map-side at scan speed and column-prune to `text` only.
  */
object TextAnalysis {

  /** Tokenizer algorithm version for fixture stamps: stored relations
    * derived from [[tokens]] (e.g. [[LmCounts]]) must rebuild when the
    * tokenization rule changes — bump alongside any change here. */
  val tokensAlgoVersion = 1

  /** Whitespace tokenization. Documents are single-space separated; the
    * regex keeps it robust to runs of whitespace. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count (letter runs | digit runs | single
    * punctuation), the standard GPT-2-style splitter shape. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern))

  /** Non-overlapping occurrence count of `marker` via length/replace
    * arithmetic — byte-identical across engines, codegen-friendly. */
  def occurrences(text: Column, marker: String): Column =
    (length(text) - length(replace(text, lit(marker), lit("")))) /
      marker.length

  /** Per-language marker sets for the n-gram/stopword language-ID
    * heuristic. Markers are space-padded so they only hit whole words. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " value ", " fast "),
    "de" -> Seq(" der ", " und ", " wert ", " schnell "),
    "fr" -> Seq(" le ", " la ", " valeur ", " vite "),
    "es" -> Seq(" el ", " los ", " valor ", " rapido "),
    "zh" -> Seq(" 的 ", " 值 ", " 快 ", " 表 "))

  /** Score = marker hits per token (normalized so long docs don't win). */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val hits = markers.map(m => occurrences(padded, m)).reduce(_ + _)
    Functions.safeDivide(hits.cast("double"), tokenCount(text).cast("double"))
  }

  /** Argmax over language scores with a deterministic first-wins
    * tie-break in declaration order ('und' = undetermined when all 0). */
  def predictedLang(text: Column): Column = {
    val scored = langMarkers.map { case (l, ms) => (l, langScore(text, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality-scoring components (heuristics from the C4/Gopher lineage:
    * length, alpha ratio, stopword ratio, mean word length). */
  def alphaRatio(text: Column): Column =
    Functions.safeDivide(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double"),
      length(text).cast("double"))

  def stopwordRatio(text: Column): Column =
    Functions.safeDivide(
      langMarkers.head._2.map(m =>
        occurrences(concat(lit(" "), text, lit(" ")), m)).reduce(_ + _)
        .cast("double"),
      tokenCount(text).cast("double"))

  def meanWordLen(text: Column): Column =
    Functions.safeDivide(
      length(regexp_replace(text, "\\s+", "")).cast("double"),
      tokenCount(text).cast("double"))

  /** Composite quality score in [0,1]-ish: weights mirror the usual
    * "not too short, mostly letters, some stopwords" heuristics. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    lenScore * 0.3 + alphaRatio(text) * 0.4 +
      least(stopwordRatio(text) * 5.0, lit(1.0)) * 0.3
  }

  /** Canonical text normalization for fingerprint/dedup: lowercase,
    * strip non-alphanumerics to spaces, squeeze + trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "),
      "\\s+", " "))

  /** 128-bit content fingerprint (hex) of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalizeText(text))

  /** 60-bit integer fingerprint: first 15 hex chars of md5, base-16 →
    * base-10. Portable: DuckDB computes the same via
    * CAST('0x' || substr(md5(s),1,15) AS BIGINT). 60 bits keeps it
    * positive in a signed 64-bit long in both engines.
    *
    * Computed by the native [[graft.functions.Hash60]] expression
    * (digest → shift, no hex round trip — the dedup family runs this
    * once per shingle/token); [[hash60Composable]] is the builtin
    * composition it is bit-identical to (property-tested). */
  def hash60(s: Column): Column = graft.functions.Hash60(s)

  def hash60Composable(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("bigint")

  /** PII-redaction patterns — deliberately alternation-free and
    * anchor-free so Java regex (Spark) and RE2 (DuckDB) match
    * identically: plain character classes + greedy quantifiers only.
    * Order matters: URLs first (their paths may embed digit runs),
    * then emails, then standalone long digit runs (phone-ish). */
  val urlRe = "https?://[^\\s]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumRe = "[0-9]{7,}"

  /** Scrub URLs / emails / long digit runs to typed placeholders — the
    * standard pre-training text-cleaning pass. Pure codegen'd
    * regexp_replace chain, map-side, no UDFs. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      longNumRe, "<NUM>")
}
