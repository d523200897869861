package graft

/** Dev tool: time one registered query in isolation (the bench runs the
  * whole registry). Usage:
  *
  *   sbt "runMain graft.ProfileQuery <queryName> [sfDir] [iters]"
  *
  * Prints per-iteration wall seconds (first = cold JIT/IO) and the
  * formatted plan, so a hot query can be iterated on without a full
  * bench pass.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = Bench.session()
    val q = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
