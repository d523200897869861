package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{Dedup, Functions, Normalize, TextAnalysis}

/** Property-based invariants (SURVEY.md §5.3) via raw ScalaCheck (the
  * scalatest bridge artifact isn't in the offline cache). Each property
  * runs a reduced case count — every case spins Spark jobs.
  */
class PropertySpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8).withWorkers(1)

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c", "")))

  test("pair scorer: batch-boundary independence, absent-terms zero " +
      "(the seam purity contract, pure JVM)") {
    import graft.ops.ModelInference
    val m = new ModelInference.TermProximityScorer
    val q = "vector merge stream"
    val tokGen = Gen.oneOf("vector", "merge", "stream", "x", "yy", "")
    val docGen = Gen.listOfN(12, tokGen).map(_.mkString(" "))
    check("pairScorerBatchIndep", Prop.forAll(docGen, docGen) { (t1, t2) =>
      val together = m.scorePairBatch(Array(q, q), Array(t1, t2)).toSeq
      val apart = Seq(m.scorePairBatch(Array(q), Array(t1))(0),
        m.scorePairBatch(Array(q), Array(t2))(0))
      together == apart
    })
    // no query term present -> exactly zero, no accidental baseline
    assert(m.scorePairBatch(Array(q), Array("x yy x"))(0) == 0L)
    // determinism across calls
    val d = "x vector yy merge stream"
    assert(m.scorePairBatch(Array(q), Array(d))(0) ==
      m.scorePairBatch(Array(q), Array(d))(0))
  }

  test("dedup is idempotent and bounded by input size (D1)") {
    check("dedup", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = Normalize.dedup(df)
      val c1 = once.count()
      c1 == Normalize.dedup(once).count() && c1 <= rows.size &&
        c1 == rows.distinct.size
    })
  }

  test("unionAll count is the sum of branch counts (D4)") {
    check("union", Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      a.toDF("k", "v").unionAll(b.toDF("k", "v")).count() == a.size + b.size
    })
  }

  test("safeDivide is NULL iff divisor is 0 or NULL, never throws (F4)") {
    val pairs = Gen.listOfN(20,
      Gen.zip(Gen.choose(-100.0, 100.0), Gen.oneOf(Gen.const(0.0),
        Gen.choose(-10.0, 10.0))))
    check("safeDivide", Prop.forAll(pairs) { ps =>
      val out = ps.toDF("a", "b")
        .select(col("b"), Functions.safeDivide(col("a"), col("b")).as("q"))
        .collect()
      out.forall(r => r.isNullAt(1) == (r.getDouble(0) == 0.0))
    })
  }

  test("lowercase rename is idempotent (P1)") {
    val nameGen = Gen.listOfN(3, Gen.alphaStr.map(s => "C" + s.take(6)))
      .map(_.zipWithIndex.map { case (n, i) => s"$n$i" }) // unique names
    check("lowercase", Prop.forAll(nameGen) { names =>
      val df = Seq((1, 2, 3)).toDF(names: _*)
      val once = Normalize.lowercaseColumns(df)
      Normalize.lowercaseColumns(once).columns.toSeq == once.columns.toSeq
    })
  }

  test("latestBy returns exactly one row per key (A2)") {
    val g = Gen.listOfN(25, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50)))
    check("latestBy", Prop.forAll(g) { rows =>
      Prop.iff[List[(Int, Int)]](rows, { case rs =>
        val df = rs.toDF("k", "v")
        val latest = Functions.latestBy(df, Seq("k"),
          Seq(col("v").desc)).collect()
        Prop(latest.length == rs.map(_._1).distinct.size &&
          latest.forall(r => rs.filter(_._1 == r.getInt(0))
            .map(_._2).maxOption.contains(r.getInt(1))))
      })
    })
  }

  test("hash60 stays in [0, 2^60) and native == builtin composition") {
    check("hash60", Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { ss =>
      val rows = ss.toDF("s").select(
        TextAnalysis.hash60(col("s")).as("nat"),
        TextAnalysis.hash60Composable(col("s")).as("com")).collect()
      rows.forall { r =>
        val h = r.getLong(0)
        h >= 0L && h < (1L << 60) && h == r.getLong(1)
      }
    })
  }

  test("AsOfJoin equals the brute-force point-in-time lookup") {
    val leftGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 100L)))
      .map(_.zipWithIndex.map { case ((k, ts), i) => (k, i.toLong, ts) })
    val rightGen = Gen.listOfN(8,
      Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 100L), Gen.choose(0L, 9L)))
    check("asof", Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.toDF("k", "id", "ts")
      // at most one right row per (k, ts): later duplicates dropped, as
      // a real reference relation would be keyed
      val rsu = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val right = rsu.toDF("k", "rts", "v")
      val got = graft.ops.AsOfJoin(left, right, "k", "ts", "rts",
        Seq("v"), Seq("id"))
        .select("k", "id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val want = ls.map { case (k, id, ts) =>
        val best = rsu.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
        (k, id, best)
      }.toSet
      got == want
    })
  }

  test("sequence packing reconstructs exact prefix sums per shard") {
    val gen = Gen.listOfN(24,
      Gen.zip(Gen.choose(0, 2), Gen.choose(1L, 700L)))
    check("packing", Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((shard, toks), i) =>
        (shard, i.toLong, toks)
      }.toDF("shard", "id", "n_tokens")
      val out = graft.ops.Packing.pack(df, "shard", "id", "n_tokens", 512)
        .select("shard", "id", "n_tokens", "seq_id", "seq_off")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // per shard in id order: start offset == running token sum, and
      // the offset always stays inside the budget
      out.groupBy(_._1).forall { case (_, g) =>
        var cum = 0L
        g.sortBy(_._2).forall { case (_, _, toks, seqId, seqOff) =>
          val ok = seqOff >= 0 && seqOff < 512 &&
            seqId * 512 + seqOff == cum
          cum += toks
          ok
        }
      }
    })
  }

  test("global rank equals the naive global window on arbitrary data") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 3)))
    check("globalRank", Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((v, g), i) => (i.toLong, v, g) }
        .toDF("id", "v", "g").repartition(5)
      val got = graft.ops.GlobalRank.withRank(df,
        Seq(col("v").desc, col("id").asc))
        .select("id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.zipWithIndex
        .map { case ((v, _), i) => (i.toLong, v) }
        .sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }.toMap
      got == want
    })
  }

  test("profile counts nulls and distincts exactly") {
    val gen = Gen.listOfN(30, Gen.option(Gen.choose(0L, 5L)))
    check("profile", Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val row = graft.ops.Profile.profile(df, Seq("v"))
        .collect().head
      row.getAs[Long]("n_rows") == vs.size &&
        row.getAs[Long]("n_null") == vs.count(_.isEmpty) &&
        row.getAs[Long]("n_distinct") == vs.flatten.distinct.size
    })
  }

  test("interval merge equals brute-force merging on arbitrary intervals") {
    // intervals as [s, s+len] over a small integer timeline so overlaps,
    // touching endpoints (s == prev_end, which must MERGE), and gaps all
    // occur; brute force merges sorted intervals per key directly
    val gen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 40L), Gen.choose(1L, 8L)))
    check("intervals", Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, s, len), i) => (k, i.toLong, s, s + len) }
        .toDF("k", "tie", "s", "e")
      val got = graft.ops.TimeSeries
        .mergeIslands(df, col("k"), col("s"), col("e"), col("tie"))
        .select(col("key"), col("interval_start"), col("interval_end"),
          col("n_events"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.map(r => (r._2, r._2 + r._3)).sortBy(identity)
        val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case (acc, (s, e)) => acc match {
            case (is, ie, n) :: rest if s <= ie =>
              (is, math.max(ie, e), n + 1) :: rest
            case _ => (s, e, 1L) :: acc
          }
        }
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      got == want
    })
  }

  test("EWMA num/den equals the direct weighted fold on arbitrary series") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.choose(0, 1), Gen.choose(0L, 999L)))
    val lookback = 4
    check("ewma", Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, i.toLong, v) }
        .toDF("k", "pos", "v")
      val got = graft.ops.TimeSeries
        .ewmaNumDen(df, col("k"), Seq(col("pos")), col("v"), lookback)
        .select(col("k"), col("pos"), col("ewma_num"), col("ewma_den"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val byKey = rows.zipWithIndex.groupBy(_._1._1)
      byKey.forall { case (_, rs) =>
        val series = rs.map { case ((k, v), i) => (k, i.toLong, v) }
        series.zipWithIndex.forall { case ((k, pos, _), j) =>
          val frame = series.slice(math.max(0, j - lookback + 1), j + 1)
          val num = frame.zipWithIndex.map { case ((_, _, x), fi) =>
            x * (1L << (lookback - frame.size + fi))
          }.sum
          val den = frame.zipWithIndex.map { case (_, fi) =>
            1L << (lookback - frame.size + fi)
          }.sum
          got((k, pos)) == ((num, den))
        }
      }
    })
  }

  test("minhash signature is invariant under row duplication") {
    check("minhash-dup", Prop.forAll(Gen.listOfN(4,
      Gen.listOfN(6, Gen.oneOf("w1", "w2", "w3", "w4")).map(_.mkString(" ")))) {
      texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val doubled = docs.unionAll(docs)
        val s1 = Dedup.minhashSignature(Dedup.hashedShingles(docs, 3))
          .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
        val s2 = Dedup.minhashSignature(Dedup.hashedShingles(doubled, 3))
          .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
        s1 == s2
    })
  }

  /** Direct Scala implementation of SEQUENTIAL rule application (each
    * rule once, in priority order, greedy leftmost within each pass,
    * over the whole normalized text — space is an ordinary symbol).
    * The iterative lowest-rank encoder must agree with it on arbitrary
    * text because the pinned learned table is well-formed (distinct
    * products, operands from strictly earlier rules — see
    * [[graft.functions.BpeEncode]]). */
  private def bpeDirect(text: String): Seq[String] = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .replaceAll("\\s+", " ")
    if (norm.isEmpty) return Seq.empty
    var toks = norm.map(_.toString).toVector
    for ((a, b) <- graft.ops.Bpe.merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2 // greedy leftmost, no overlap
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  test("BPE columnar rewrite equals the direct merge fold on arbitrary text") {
    val textGen = Gen.listOfN(6,
      Gen.oneOf(Gen.alphaLowerStr.map(_.take(8)),
        Gen.oneOf("the", "that", "which", "anana", "thethe", "ing", "",
          "Mixed CASE!", "42nd street")))
      .map(_.mkString(" "))
    check("bpe", Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          graft.ops.Bpe.tokens(col("text")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
        .toMap
      texts.zipWithIndex.forall { case (t, i) =>
        got(i.toLong) == bpeDirect(t).toList
      }
    })
  }

  test("native argmin equals the direct fold on arbitrary codebooks " +
      "(NearestCell, incl. equidistant ties)") {
    // values from a SMALL set so equidistant ties actually occur, and
    // duplicate cells (same centroid, different cid) are likely
    val dim = 3
    val vGen = Gen.listOfN(dim, Gen.choose(-3L, 3L))
    val cellGen = Gen.zip(Gen.choose(0L, 9L), vGen)
    val caseGen = Gen.zip(
      Gen.listOfN(5, vGen),
      Gen.nonEmptyListOf(cellGen).map(_.take(6)))
    check("nearestCell", Prop.forAll(caseGen) { case (vecs, cells) =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "iv")
      val cent = cells.map { case (cid, c) => (cid, c: Seq[Long]) }
      val got = graft.ops.KMeans.assignCell(df, cent)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toList
      // reference: global (d2, cid)-lexicographic minimum, pure Scala
      val want = vecs.zipWithIndex.map { case (v, i) =>
        val (d2, cid) = cent.map { case (cid, c) =>
          (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }.min
        (i.toLong, cid, d2)
      }.toList
      got == want
    })
  }
}
