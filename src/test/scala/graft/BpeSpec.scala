package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** The BPE tokenizer: hand-computed encodings under the seed table,
  * the character-conservation invariant, greedy-leftmost semantics of
  * overlapping merges, and the iterative-encoder ↔ nested-replace
  * parity on the full pinned learned table. */
class BpeSpec extends SparkSuite {

  /** Encode under the hand-written 40-rule SEED table (hand-computable;
    * it has no space-crossing rules, so single words behave exactly as
    * classic word-level BPE). */
  private def toks(s: String): Seq[String] = {
    import SparkSpec.spark.implicits._
    Seq(s).toDF("text")
      .select(Bpe.tokensWith(col("text"), Bpe.seedMerges).as("t"))
      .first().getSeq[String](0)
  }

  test("merges apply in priority order (hand-computed encodings)") {
    // t+h → th, th+e → the: one token
    assert(toks("The") == Seq("the"))
    // (h,i) outranks (w,h): w,h,i,c,h → w,hi,c,h
    assert(toks("which") == Seq("w", "hi", "c", "h"))
    // "that": t,h,a,t → th,a,t → (a,t) → th,at; (th,at) is last → that
    assert(toks("that") == Seq("that"))
    // unknown word falls back to characters (minus fired merges)
    assert(toks("xyzzy") == Seq("x", "y", "z", "z", "y"))
    // space is an ordinary symbol: no seed rule merges across it, so
    // an unmerged boundary surfaces as a lone-space token
    assert(toks("to be") == Seq("to", " ", "be"))
  }

  test("greedy leftmost on overlapping pairs: no shared characters") {
    // (a,n) on "anan": a,n,a,n → an,an (both fire — adjacent
    // occurrences share no symbols)
    assert(toks("ananas").take(2) == Seq("an", "an"))
  }

  test("character conservation: tokens re-concatenate to the normalized text") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(200)
    val bad = docs.select(
      concat_ws("", Bpe.tokens(col("text"))).as("rejoined"),
      graft.ops.TextAnalysis.normalizeText(col("text")).as("norm"))
      .filter(col("rejoined") =!= col("norm"))
    assert(bad.count() == 0)
  }

  test("iterative encoder equals the nested-replace formulation on a " +
      "192-rule prefix of the pinned table") {
    // a PREFIX of a well-formed table is itself well-formed, so parity
    // must hold rule-for-rule; the nested formulation cannot run the
    // full 1k-rule table at all (the Column tree overflows the stack —
    // the exact ceiling the iterative encoder exists to remove). Full-
    // table equivalence is covered by PropertySpec's driver-side
    // sequential fold.
    val prefix = Bpe.merges.take(192)
    val docs = graft.tables.Catalog.documents(spark, sf).limit(60)
    val norm = graft.ops.TextAnalysis.normalizeText(col("text"))
    val bad = docs.select(
      Bpe.encodeWith(norm, prefix).as("fast"),
      Bpe.encodeNested(norm, prefix).as("nested"))
      .filter(col("fast") =!= col("nested"))
    assert(bad.count() == 0)
  }

  test("encoder handles a 5000-rule vocabulary: sequential-fold parity " +
      "and character conservation") {
    import SparkSpec.spark.implicits._
    // a WELL-FORMED synthetic table far past the pinned 1024 rules:
    // seed 676 bigram rules (aa..zz), then chain products with single
    // chars round-robin — every operand is a single char or an earlier
    // product, products are distinct by construction. The nested
    // formulation could never run this (it overflows near 1k); the
    // iterative encoder must keep exact sequential semantics at any
    // table size — this is the 32k-100k-vocab scale claim in miniature.
    val letters = ('a' to 'z').map(_.toString)
    val bigrams = for (a <- letters; b <- letters) yield (a, b)
    val chained = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var prev = bigrams.map { case (a, b) => a + b }
    var li = 0
    while (chained.size + bigrams.size < 5000) {
      val next = prev.map { p =>
        val c = letters(li % 26)
        chained += ((p, c))
        p + c
      }
      li += 1
      prev = next.take(300) // bound growth, keep 5k total
    }
    val table = (bigrams ++ chained).toSeq
    assert(table.size >= 5000)

    def sequentialFold(text: String): Seq[String] = {
      var toks = text.map(_.toString).toVector
      for ((a, b) <- table) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    val texts = Seq("the quick brown fox", "aaaaaaaab", "zzzyyyxxx",
      "abcabcabcabcabc", "a", "", "aazaazaaz plus words")
    val norm = texts.map(_.toLowerCase.replaceAll("[^a-z0-9]+", " ")
      .trim.replaceAll("\\s+", " "))
    val got = norm.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Bpe.tokensWith(col("t"), table).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    norm.zipWithIndex.foreach { case (t, i) =>
      val expect =
        if (t.isEmpty) Nil
        else sequentialFold(t).toList
      assert(got(i.toLong) == expect, s"text '$t'")
      assert(got(i.toLong).mkString("") == t, s"conservation on '$t'")
    }
  }

  test("train() learns the hand-computable merges of a tiny corpus") {
    import SparkSpec.spark.implicits._
    val docs = Seq("abab", "abc").toDF("text")
    // pass 1: (a,b) appears 3 times — learned first; pass 2: the corpus
    // is [ab][ab] / [ab][c], tie at 1 breaks lexicographically to
    // (ab,ab); pass 3: [abab] / [ab][c] leaves only (ab,c); then no
    // pairs remain and training stops early regardless of k
    val learned = Bpe.train(docs, "text", k = 5)
    assert(learned ==
      Seq(("a", "b", 3L), ("ab", "ab", 1L), ("ab", "c", 1L)))
  }

  test("train() is deterministic and its merges compress the corpus") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(150)
    val a = Bpe.train(docs, "text", k = 8)
    val b = Bpe.train(docs, "text", k = 8)
    assert(a == b && a.size == 8)
    assert(a.forall(_._3 > 0))
    // distinct merges, and every learned rule fires on the corpus it
    // was learned from: token count strictly drops vs characters
    // (every normalized char, spaces included, starts as one symbol)
    assert(a.map(m => (m._1, m._2)).distinct.size == 8)
    val counts = docs.select(
      sum(Bpe.tokenCountWith(col("text"), a.map(m => (m._1, m._2))))
        .cast("long").as("bpe"),
      sum(length(graft.ops.TextAnalysis.normalizeText(col("text"))))
        .cast("long").as("chars")).first()
    assert(counts.getLong(0) < counts.getLong(1))
  }

  test("batched training reaches an 8192-rule vocabulary in <= 64 passes " +
      "and the table stays well-formed") {
    // the scale path: one counting pass learns up to m DISJOINT-OPERAND
    // merges (Bpe.selectBatch), so a real vocabulary is ~vocab/m passes
    // — here 8192 rules from the documents corpus, where the sequential
    // trainer would need 8192 passes
    val counts = graft.tables.Catalog.documents(spark, sf)
      .select(graft.ops.TextAnalysis.normalizeText(col("text")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val (learned, passes) = Bpe.trainLocalBatched(counts, k = 8192, m = 256)
    assert(learned.size >= 8192, s"only ${learned.size} rules learned")
    assert(passes <= 64, s"took $passes passes")
    // well-formed: distinct products; every operand is a single char or
    // the product of a strictly earlier rule — the property that makes
    // the iterative encoder equal sequential rule application
    val prods = learned.map(t => t._1 + t._2)
    assert(prods.distinct.size == prods.size)
    val seen = scala.collection.mutable.HashSet.empty[String]
    learned.foreach { case (a, b, _) =>
      assert(a.length == 1 || seen.contains(a), s"ill-formed left operand '$a'")
      assert(b.length == 1 || seen.contains(b), s"ill-formed right operand '$b'")
      seen += (a + b)
    }
    // sequential-fold equivalence of the codegen encoder on the trained
    // 8k table (the well-formedness payoff, exercised end to end)
    val table = learned.map(t => (t._1, t._2))
    def fold(text: String): List[String] = {
      var toks = text.map(_.toString).toVector
      for ((a, b) <- table) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks.toList
    }
    import SparkSpec.spark.implicits._
    val sample = counts.take(20).map(_._1)
    val got = sample.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Bpe.tokensWith(col("t"), table).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    sample.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == fold(t), s"text ${i}")
    }
  }

  test("distributed trainBatched: m=1 equals the sequential trainer; " +
      "batching bounds counting passes") {
    import SparkSpec.spark.implicits._
    val docs = Seq("abab", "abc").toDF("text")
    val (seq1, p1) = Bpe.trainBatched(docs, "text", k = 5, m = 1)
    assert(seq1 == Bpe.train(docs, "text", k = 5))
    assert(p1 == 4) // 3 learning passes + the dry pass that stops it
    val big = graft.tables.Catalog.documents(spark, sf).limit(100)
    val (batched, passes) = Bpe.trainBatched(big, "text", k = 24, m = 8)
    assert(batched.size == 24)
    assert(passes <= 6, s"took $passes passes for 24 rules at m=8")
    val prods = batched.map(t => t._1 + t._2)
    assert(prods.distinct.size == prods.size)
  }

  test("tokenCount equals the exploded token count") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(200)
    val bad = docs.select(
      Bpe.tokenCount(col("text")).as("n"),
      size(Bpe.tokens(col("text"))).as("m"))
      .filter(col("n") =!= col("m"))
    assert(bad.count() == 0)
  }

  test("storedTokens matches the live encoder, reuses the stamp, and rebuilds on data change") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // private sf-shaped scratch dataset so the stamp lifecycle can be
    // driven without touching the shared store (stale-fixture lesson:
    // ADVICE r8 on KnnGraphSpec's hard-coded /tmp stamp)
    val dsName = "bpestore_spec"
    val ds = s"/tmp/graft_spec/$dsName"
    // the store dir is keyed by a hash of the ABSOLUTE dataset path
    // (ops/Fixtures.pathKey) — same-basename datasets can't collide
    val storeDir =
      s"/tmp/graft_fixtures/spark_dt_${graft.ops.Fixtures.pathKey(ds)}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ds))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(storeDir))
    Files.createDirectories(Paths.get(ds))
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(s"$ds/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val live = Bpe.docTokensDf(graft.tables.Catalog.documents(spark, ds))
      .selectExpr("doc_id", "n_bpe", "array_join(toks, '|') AS t")
    val stored1 = Bpe.storedTokens(spark, ds)
      .selectExpr("doc_id", "n_bpe", "array_join(toks, '|') AS t")
    assert(stored1.exceptAll(live).count() == 0 &&
      live.exceptAll(stored1).count() == 0)
    // warm reuse: stamp unchanged -> same files on disk
    val files1 = new java.io.File(storeDir).listFiles().map(_.getName).toSet
    Bpe.storedTokens(spark, ds).count()
    val files2 = new java.io.File(storeDir).listFiles().map(_.getName).toSet
    assert(files1 == files2, "stamped store must be reused, not rewritten")
    // data regeneration (mtime change) -> rebuild
    val f = new java.io.File(s"$ds/documents.parquet")
    assert(f.setLastModified(f.lastModified() + 60000))
    Bpe.storedTokens(spark, ds).count()
    val stamp = new String(Files.readAllBytes(
      Paths.get(s"$storeDir/_stamp")), "UTF-8")
    assert(stamp.contains((f.lastModified()).toString),
      s"stamp must track the new mtime: $stamp")
  }
}
