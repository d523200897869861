package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

class PageRankSpec extends SparkSuite {

  test("one iteration matches hand-computed integer ranks") {
    import SparkSpec.spark.implicits._
    // 1→2, 1→3, 2→3, 3→1: outdeg(1)=2, outdeg(2)=1, outdeg(3)=1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = PageRank.run(edges, 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(
      1L -> 1000000L, // 150000 + 85·1000000/100
      2L -> 575000L,  // 150000 + 85·(1000000 div 2)/100
      3L -> 1425000L  // 150000 + 85·(500000 + 1000000)/100
    ))
  }

  test("integer ranks are partitioning-invariant") {
    import SparkSpec.spark.implicits._
    val edges = (1L to 400L).map(i => (i % 37, (i * i) % 41))
      .filter { case (a, b) => a != b }.distinct
      .toDF("src", "dst")
    val a = PageRank.run(edges.repartition(1), 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.run(edges.repartition(13), 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }
}
