package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenRepStats

/** The one-pass repetition-statistics expression must agree exactly
  * with the declarative explode + groupBy form it replaced (q80's
  * pre-r18 dataflow), including the cases that distinguish exact
  * string identity from hashing: duplicate tokens, adjacent bigram
  * multiplicities, empty-string tokens, and single-token docs. */
class TokenRepStatsSpec extends SparkSuite {

  private def reference(toks: Seq[String]): (Long, Long, Long, Long) = {
    val uni = toks.groupBy(identity).view.mapValues(_.size)
    val bis = toks.zip(toks.drop(1))
    (toks.size.toLong,
      if (uni.isEmpty) 0L else uni.values.max.toLong,
      bis.size.toLong,
      bis.distinct.size.toLong)
  }

  test("matches the explode+groupBy reference on adversarial and random docs") {
    val spk = spark
    import spk.implicits._
    val docs: Seq[Seq[String]] = Seq(
      Seq("a"), Seq("a", "a"), Seq("a", "b", "a", "b", "a"),
      Seq("", "a", ""), // empty-string tokens are real group keys
      Seq("x y"), // a token containing a space must not merge bigrams
      Seq("a", "b", "c", "a", "b", "c", "a", "b"),
      Seq.fill(50)("rep"),
      Seq()) ++ {
      val rnd = new scala.util.Random(41)
      Seq.fill(60)(Seq.fill(rnd.nextInt(40))(s"t${rnd.nextInt(6)}"))
    }
    val got = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "toks")
      .select(col("id"), TokenRepStats(col("toks")).as("st"))
      .select(col("id"), col("st.n_tok"), col("st.max_uni"),
        col("st.n_bi"), col("st.n_bi_d"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.zipWithIndex.foreach { case (d, i) =>
      assert(got(i.toLong) == reference(d), s"doc $i: $d")
    }
  }

  test("filter on a result field evaluates the pass ONCE per row " +
      "(non-deterministic blocks pushdown duplication, r19)") {
    val spk = spark
    import spk.implicits._
    // the q80/q93 shape: repartition, project the struct, filter on its
    // fields — filter pushdown used to substitute the alias and re-run
    // the whole pass below the exchange (6x per row for q93's gate)
    val df = Seq((1L, Seq("a", "b", "a")), (2L, Seq("c")))
      .toDF("id", "toks")
      .repartition(2)
      .withColumn("st", TokenRepStats(col("toks")))
      .filter(col("st.n_tok") > 0 &&
        col("st.max_uni").cast("double") / col("st.n_tok") <= 0.9)
      .select(col("id"), col("st.n_bi"))
    val optimized = df.queryExecution.optimizedPlan
    var n = 0
    optimized.foreach(_.expressions.foreach(_.foreach {
      case _: TokenRepStats => n += 1
      case _ => ()
    }))
    assert(n == 1, s"expected exactly ONE TokenRepStats in the " +
      s"optimized plan, found $n:\n$optimized")
    // and the filter still filters: row 2 (single token, max_uni=1/1)
    // is dropped by the 0.9 gate, row 1 (2/3) kept
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("registered as token_rep_stats for SQL, and codegen path agrees " +
      "with interpreted eval") {
    val spk = spark
    import spk.implicits._
    TokenRepStats.register(spark.sessionState.functionRegistry)
    val df = Seq((1L, Seq("a", "b", "a"))).toDF("id", "toks")
    df.createOrReplaceTempView("trs_docs")
    val viaSql = spark.sql(
      "SELECT token_rep_stats(toks) AS st FROM trs_docs")
      .select(col("st.n_tok"), col("st.max_uni"), col("st.n_bi"),
        col("st.n_bi_d")).collect().head
    assert((viaSql.getLong(0), viaSql.getLong(1), viaSql.getLong(2),
      viaSql.getLong(3)) == ((3L, 2L, 2L, 2L)))
  }
}
