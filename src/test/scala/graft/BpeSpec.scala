package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** The pinned-merge-table BPE tokenizer: hand-computed encodings, the
  * character-conservation invariant, and the greedy-leftmost semantics
  * of overlapping merges. */
class BpeSpec extends SparkSuite {

  private def toks(s: String): Seq[String] = {
    import SparkSpec.spark.implicits._
    Seq(s).toDF("text")
      .select(Bpe.tokens(col("text")).as("t"))
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
  }

  test("greedy leftmost on overlapping pairs: no shared characters") {
    // (a,n) on "anan": a,n,a,n → an,an (both fire — marker wrapping
    // means adjacent occurrences share no string bytes)
    assert(toks("ananas").take(2) == Seq("an", "an"))
  }

  test("character conservation: tokens re-concatenate to the normalized text") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(200)
    val bad = docs.select(
      concat_ws("", Bpe.tokens(col("text"))).as("rejoined"),
      regexp_replace(graft.ops.TextAnalysis.normalizeText(col("text")),
        " ", "").as("squeezed"))
      .filter(col("rejoined") =!= col("squeezed"))
    assert(bad.count() == 0)
  }

  test("train() learns the hand-computable merges of a tiny corpus") {
    import SparkSpec.spark.implicits._
    val docs = Seq("ab ab ab", "abc").toDF("text")
    // pass 1: (a,b) appears 4 times — learned first; pass 2: the merged
    // corpus is [ab][ab][ab] / [ab][c], so (ab,c) x1; then no pairs
    // remain and training stops early regardless of k
    val learned = Bpe.train(docs, "text", k = 5)
    assert(learned == Seq(("a", "b", 4L), ("ab", "c", 1L)))
  }

  test("train() is deterministic and its merges compress the corpus") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(150)
    val a = Bpe.train(docs, "text", k = 8)
    val b = Bpe.train(docs, "text", k = 8)
    assert(a == b && a.size == 8)
    assert(a.forall(_._3 > 0))
    // distinct merges, and every learned rule fires on the corpus it
    // was learned from: token count strictly drops vs characters
    assert(a.map(m => (m._1, m._2)).distinct.size == 8)
    val counts = docs.select(
      sum(Bpe.tokenCount(col("text"))).cast("long").as("bpe"),
      sum(length(regexp_replace(
        graft.ops.TextAnalysis.normalizeText(col("text")), " ", "")))
        .cast("long").as("chars")).first()
    assert(counts.getLong(0) < counts.getLong(1))
  }

  test("tokenCount equals the exploded token count") {
    val docs = graft.tables.Catalog.documents(spark, sf).limit(200)
    val bad = docs.select(
      Bpe.tokenCount(col("text")).as("n"),
      size(Bpe.tokens(col("text"))).as("m"))
      .filter(col("n") =!= col("m"))
    assert(bad.count() == 0)
  }
}
