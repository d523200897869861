package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic batch selection for BATCHED training: from pair
    * candidates ordered (count desc, left asc, right asc), greedily
    * take up to `m` merges whose operand symbols are PAIRWISE DISJOINT
    * (no selected rule shares a left/right symbol with another) and
    * whose product string is new. Disjointness is what makes the batch
    * sound: merging `a b` can only destroy adjacencies that touch `a`
    * or `b`, so the start-of-pass counts of every other selected pair
    * stay exact, and the rules commute — applying the batch in any
    * order equals applying each sequentially. That is the standard
    * route to a real 32k–100k vocabulary: ~vocab/m counting passes
    * instead of one per merge. */
  private[graft] def selectBatch(
      cands: Seq[((String, String), Long)], m: Int,
      existingProducts: scala.collection.Set[String])
      : Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val newProducts = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val it = cands.sortBy { case ((a, b), n) => (-n, a, b) }.iterator
    while (out.size < m && it.hasNext) {
      val ((a, b), n) = it.next()
      val prod = a + b
      if (!existingProducts.contains(prod) && !newProducts.contains(prod)
          && !used.contains(a) && !used.contains(b)) {
        used += a; used += b
        newProducts += prod
        out += ((a, b, n))
      }
    }
    out.toSeq
  }

  /** BATCHED distributed training: [[train]]'s learning loop with up
    * to `m` disjoint-operand merges learned per counting pass
    * ([[selectBatch]]), so a `k`-rule vocabulary costs ~k/m shuffles
    * over symbol-pair rows instead of k — the difference between an
    * infeasible 32k shuffles and a bounded ~128 at a real vocabulary
    * size. Candidate collection per pass is driver-bounded (top
    * `8·m` pairs by the deterministic order — far more than a batch
    * ever needs, since only product collisions can reject the head of
    * the list). Returns (merges in learned order, counting passes). */
  def trainBatched(docs: DataFrame, textCol: String, k: Int, m: Int)
      : (Seq[(String, String, Long)], Int) = {
    require(k >= 1 && k <= 131072, "bounded training: 1..131072 merges")
    require(m >= 1 && m <= 4096, "batch size: 1..4096")
    val norm = TextAnalysis.normalizeText(col(textCol))
    val products = scala.collection.mutable.HashSet.empty[String]
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var passes = 0
    var dry = false
    while (learned.size < k && !dry) {
      val enc = encodeWith(norm, learned.toSeq.map(t => (t._1, t._2)))
      val cands = docs
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
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(math.max(8 * m, 64))
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
      val batch = selectBatch(cands, math.min(m, k - learned.size), products)
      if (batch.isEmpty) dry = true
      else batch.foreach { case t @ (a, b, _) =>
        products += (a + b); learned += t
      }
      passes += 1
    }
    (learned.toSeq, passes)
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

  /** BATCHED [[trainLocalFromCounts]]: up to `m` disjoint-operand
    * merges per counting pass ([[selectBatch]] — same determinism,
    * same well-formedness guarantees), applied in ONE combined
    * left-to-right scan per pass (sound because disjoint rules can
    * neither contend for a position nor create each other's
    * adjacencies). ~k/m passes instead of k — how a 32k–100k-rule
    * vocabulary is actually trained. Returns (merges, passes). */
  def trainLocalBatched(unitCounts: Seq[(String, Long)], k: Int, m: Int)
      : (Seq[(String, String, Long)], Int) = {
    require(k >= 1 && m >= 1, "k >= 1, m >= 1")
    var units: Array[(Array[String], Long)] = unitCounts
      .filter(_._1.nonEmpty)
      .sortBy(_._1)
      .map { case (w, c) => (w.toCharArray.map(String.valueOf), c) }
      .toArray
    val products = scala.collection.mutable.HashSet.empty[String]
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var passes = 0
    var dry = false
    while (learned.size < k && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- units) {
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      val batch = selectBatch(counts.toSeq,
        math.min(m, k - learned.size), products)
      if (batch.isEmpty) dry = true
      else {
        val rules = batch.map { case (a, b, _) => (a, b) -> (a + b) }.toMap
        batch.foreach { case t @ (a, b, _) =>
          products += (a + b); learned += t
        }
        units = units.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length &&
                  rules.contains((syms(i), syms(i + 1)))) {
                out += rules((syms(i), syms(i + 1))); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
      }
      passes += 1
    }
    (learned.toSeq, passes)
  }

  // ---- oracle SQL generation (same declarations, DuckDB dialect) ----

  /** Fixed location of the SHARED TOKENIZATION FIXTURE — the pinned
    * (doc_id, n_bpe, toks) table [[graft.Verify]] materializes once
    * per run. Replaying the full merge table as nested-replace CTEs
    * costs the DuckDB oracle seconds PER QUERY; every BPE-dependent
    * oracle except the anchor reads this fixture instead, so the
    * replay runs once, not ten times. The fixture's own correctness
    * is anchored by `q162_bpe_table`, whose oracle IS the full replay
    * compared hash-exact against the identical Spark-side table —
    * if the fixture were wrong, the anchor goes red. The path is
    * deliberately outDir-independent: oracle SQL is static text. */
  val dtFixturePath = "/tmp/graft_fixtures/bpe_dt.parquet"

  /** The fixture-reading replacement for [[docTokenCtes]] — same CTE
    * name and columns (`dt(doc_id, n_bpe, toks)`), read from the
    * materialized parquet instead of replayed. */
  def dtFixtureCte: String =
    s"dt AS (SELECT doc_id, n_bpe, toks\n" +
      s"       FROM read_parquet('$dtFixturePath/*.parquet'))"

  /** The fixture's content, Spark-side: every document's token count
    * and ordered token list under the pinned merges — exactly the
    * `dt` CTE [[docTokenCtes]] declares, as a DataFrame. */
  def docTokensDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      tokenCount(col("text")).cast("bigint").as("n_bpe"),
      tokens(col("text")).as("toks"))

  /** STORED per-document token table — the engine-side twin of the
    * oracle's dt fixture: tokenize ONCE per (dataset generation, merge
    * table), store as parquet, and let every downstream token consumer
    * (chunking, packing quotas, compression scoring, pipelines) read
    * the store instead of re-running the encoder inside its own plan.
    * This is the production shape at any scale — a corpus is tokenized
    * once per tokenizer version, not once per consumer — and it is the
    * symmetric design to the oracle side, whose fixture rebuild is
    * likewise stamped and amortized (tools/bench_oracle.py).
    *
    * Store mechanics are [[Fixtures.ensure]]: the dir is keyed by a
    * hash of the ABSOLUTE dataset path (same-basename datasets can't
    * thrash), the stamp covers every part file of documents.parquet
    * (len, mtime) plus a CONTENT hash of the merge table (an entry
    * rewrite that keeps the count still invalidates) and a format
    * version, and the publish is a staged rename-aside on the store's
    * own filesystem — stamp and data land on the same FS, and a crash
    * at any point leaves a complete generation, never a stampless
    * half-write. q162 stays the independent full-replay anchor proving
    * store contents ≡ the encoder's live output. */
  private lazy val mergesHash: String =
    Fixtures.contentHash(merges.map(m => m._1 + "\u0001" + m._2)
      .mkString("\n"))

  /** Encoder algorithm version for the stored-token fixture stamp:
    * the merge TABLE is content-hashed into the stamp, but the encoder
    * LOGIC (sentinel wrapping, merge application order) is not — bump
    * this when it changes. */
  val encoderAlgoVersion = 1

  def storedTokens(s: SparkSession, d: String): DataFrame = {
    val dir = s"${Fixtures.root(s)}/spark_dt_${Fixtures.pathKey(d)}"
    val stamp = Fixtures.datasetStamp(s, s"$d/documents.parquet") +
      s"|merges=$mergesHash|algo=$encoderAlgoVersion|fmt=2"
    Fixtures.ensure(s, dir, stamp) { stg =>
      docTokensDf(graft.tables.Catalog.documents(s, d))
        .write.mode("overwrite").parquet(stg)
    }
    s.read.parquet(dir)
  }

  /** Standalone DuckDB replay SELECT producing the fixture's rows —
    * what [[docTokenCtes]] wraps, as a complete statement. Dumped by
    * [[graft.Verify]] as `fixture_sql.json` so `tools/bench_oracle.py`
    * can rebuild the fixture independently (pure DuckDB) when timing
    * oracles at a different scale factor. */
  def dtReplaySql(normInner: String): String =
    s"WITH ${docTokenCtes(normInner)}\nSELECT doc_id, n_bpe, toks FROM dt"

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
