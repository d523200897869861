package graft

/** Guards the driver-facing bench contract: the compact JSON line must
  * stay inside the ~2000-char stdout tail the driver retains (r1–r4
  * overflowed it and parsed as null), and the side-effecting set must
  * track the registry (a renamed query would silently demote to the
  * executed-warmup path). */
class BenchLineSpec extends SparkSuite {

  test("compact bench line stays under the driver's stdout tail") {
    // worst-case rendering: every query at untrimmable 2-digit seconds
    // (a uniform-99.9s bench is already a driver timeout — any real
    // line is shorter)
    val worst = SparkEntry.registry.map(q => q.name -> 99.94)
    val line = Bench.compactLine(worst, "/root/testdata/sf0.1")
    assert(line.length < 1900,
      s"bench line is ${line.length} bytes at ${worst.size} queries — " +
        "the driver tail keeps ~2000; shorten the rendering before " +
        "registering more queries")
  }

  test("every sideEffecting name exists in the registry") {
    val names = SparkEntry.registry.map(_.name).toSet
    val ghosts = queries.Q.sideEffecting.diff(names)
    assert(ghosts.isEmpty, s"sideEffecting names not in registry: $ghosts")
  }
}
