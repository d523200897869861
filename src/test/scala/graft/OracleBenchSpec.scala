package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The committed DuckDB yardstick (ORACLE_BENCH.json) must cover every
  * TIMED registry query: the bench's spark-vs-oracle ratio sums oracle
  * seconds over exactly the timed names, so a registry add that skips
  * the yardstick silently understates the denominator (VERDICT r10
  * missing #2). This pins names, not values — a refresh is re-timing;
  * a gap is a correctness hole in the headline metric. */
class OracleBenchSpec extends AnyFunSuite {

  test("ORACLE_BENCH.json names cover the timed registry exactly") {
    val p = Paths.get("ORACLE_BENCH.json")
    assert(Files.exists(p), "ORACLE_BENCH.json must be committed")
    val text = Files.readString(p)
    val recorded = """"(q[0-9][^"]+)"\s*:""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val timed = SparkEntry.queries.keySet
      .filterNot(queries.Q.benchExcluded.contains)
    val missing = timed -- recorded
    assert(missing.isEmpty,
      s"yardstick lags the registry — re-run tools/bench_oracle.py and " +
        s"merge (missing: ${missing.toSeq.sorted.mkString(", ")})")
    // extra recorded names are fine if they're registry queries (the
    // correctness-only set may be timed for reference); a name OUTSIDE
    // the registry is a deregistered leftover inflating nothing — but
    // it signals the file wasn't refreshed with the registry.
    val stale = recorded -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"yardstick records names not in the registry (deregistered " +
        s"leftovers): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
