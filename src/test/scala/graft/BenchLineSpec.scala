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
    // line is shorter); "queries" caps at 24 entries so the line no
    // longer grows with the number of HEAVY queries, only ~5 B/query
    // via "qcs"
    val stats = SparkEntry.registry.map(q =>
      q.name -> Bench.RunStats(99999L, 999999L)).toMap
    val worst = SparkEntry.registry.map(q => q.name -> 99.94)
    // worst-case env flags too: every query 99× its trailing median
    // (the flag set caps at 8 entries regardless of how many qualify)
    val trailing = SparkEntry.registry.map(q => q.name -> 1.0).toMap
    // worst-case canary series (one per 20 queries, all untrimmable)
    // and a streaming-prime field ride the line too
    val canary = Seq.fill(SparkEntry.registry.size / 20 + 1)(99.94)
    val line = Bench.compactLine(worst, "/root/testdata/sf0.1", stats,
      trailing, canary, Some(99.94))
    assert(line.length < 1900,
      s"bench line is ${line.length} bytes at ${worst.size} queries — " +
        "the driver tail keeps ~2000; shorten the rendering before " +
        "registering more queries")
    assert(line.contains("\"env\":{"))
    // VERDICT r6 #6: ≥600 B of headroom at a 165-query registry under
    // realistic times (sub-second typical, a handful of heavies)
    val grown = (1 to 165).map(i => f"q$i%03d_sim" ->
      (if (i % 12 == 0) 2.43 else 0.43))
    val grownLine = Bench.compactLine(grown, "/root/testdata/sf0.1", stats)
    assert(grownLine.length <= 1300,
      s"realistic 165-query line is ${grownLine.length} bytes — " +
        "need >=600 B headroom under the ~2000-char tail")
  }

  test("compact line carries full per-query fidelity via qcs") {
    val results = Seq("q01_a" -> 0.251, "q02_b" -> 2.034, "q03_c" -> 0.004)
    val line = Bench.compactLine(results, "/root/testdata/sf0.1",
      Map("q02_b" -> Bench.RunStats(123L, 456L)))
    // name-sorted registry order, centiseconds, zero stays zero
    assert(line.contains("\"qcs\":\"25,203,0\""))
    // only the >=0.95s query makes the name-keyed object
    assert(line.contains("\"queries\":{\"q02\":2}"))
    // diagnostics ride on the top-5
    assert(line.contains("\"q02\":{\"cs\":203,\"shmb\":123,\"gc\":456}"))
  }

  test("env flags mark only queries >2x their trailing median") {
    val results = Seq("q01_a" -> 0.90, "q02_b" -> 2.034, "q03_c" -> 0.08)
    val line = Bench.compactLine(results, "/root/testdata/sf0.1",
      Map.empty,
      // q01: 3x its median 0.30 -> flagged; q02: 1.3x 1.60 -> not;
      // q03: 4x 0.02 but the median is sub-100ms jitter -> not
      Map("q01_a" -> 0.30, "q02_b" -> 1.60, "q03_c" -> 0.02))
    assert(line.contains("\"env\":{\"q01\":3.0}"))
    assert(!line.contains("\"q02\":1"))
    // and with no trailing history the object is empty, not absent
    val bare = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(bare.contains("\"env\":{}"))
  }

  test("per-class subtotals ride the line (dataflow/protocol/streaming)") {
    val results = Seq(
      "q01_pure" -> 1.5, "q02_pure" -> 0.5, // dataflow
      "q12_incremental_load" -> 2.0, // protocol
      "q26_streaming_ingest" -> 3.0) // streaming
    val line = Bench.compactLine(results, "/root/testdata/sf0.1")
    assert(line.contains(""""df":{"s":2"""))
    assert(line.contains(""""pr":{"s":2"""))
    assert(line.contains(""""st":{"s":3"""))
    // a selection with no side-effecting queries emits only its class
    val pure = Bench.compactLine(Seq("q01_pure" -> 1.0),
      "/root/testdata/sf0.1")
    assert(pure.contains(""""cls":{"df":{"s":1"""))
    assert(!pure.contains(""""pr":""") && !pure.contains(""""st":"""))
    // classification agrees with the registry taxonomy
    assert(queries.Q.cls("q19_dedup_minhash_lsh") == "dataflow")
    assert(queries.Q.cls("q12_incremental_load") == "protocol")
    assert(queries.Q.cls("q201_stream_dedup") == "streaming")
    assert(queries.Q.cls("q138_persistent_ann_index") == "protocol")
  }

  test("every sideEffecting name exists in the registry") {
    val names = SparkEntry.registry.map(_.name).toSet
    val ghosts = queries.Q.sideEffecting.diff(names)
    assert(ghosts.isEmpty, s"sideEffecting names not in registry: $ghosts")
  }

  test("streaming/protocol taxonomy is explicit and total over " +
      "sideEffecting") {
    // the streaming set is enumerated, not name-derived (r15 ADVICE):
    // it must be a subset of sideEffecting, and every sideEffecting
    // member must land in exactly one class on purpose — this list is
    // the reviewed protocol roster; a new side-effecting query must be
    // added here (or to Q.streaming) deliberately
    assert(queries.Q.streaming.subsetOf(queries.Q.sideEffecting),
      s"streaming names outside sideEffecting: " +
        s"${queries.Q.streaming.diff(queries.Q.sideEffecting)}")
    val protocol = queries.Q.sideEffecting.diff(queries.Q.streaming)
    val expectedProtocol = Set(
      "q12_incremental_load", "q13_audit_log", "q33_csv_roundtrip",
      "q38_json_roundtrip", "q39_orc_roundtrip", "q69_schema_evolution",
      "q71_incremental_agg", "q127_targeted_delete", "q132_time_travel",
      "q131_observed_metrics", "q138_persistent_ann_index",
      "q170_persistent_graph_index",
      // q175 left for dataflow in r18: stamped-store probe, the
      // q94/q96/q115 precedent (see Q.sideEffecting's note)
      "q216_compact_publish", "q219_compact_small_tail", // r18, see Q
      "q145_xml_roundtrip", "q150_ann_recall", "q152_sql_delete_frontdoor",
      "q163_sql_insert_frontdoor", "q172_sql_script_frontdoor",
      "q173_sql_script_audit")
    assert(protocol == expectedProtocol,
      s"unreviewed protocol-class members: ${protocol.diff(expectedProtocol)}"
        + s"; missing: ${expectedProtocol.diff(protocol)}")
    // a hypothetical side-effecting query merely MENTIONING "stream"
    // would not be misclassified: cls consults the set, not the name
    assert(queries.Q.cls("q999_downstream_compact") == "dataflow")
  }

  test("every benchExcluded name exists in the registry (and stays " +
      "correctness-covered)") {
    val names = SparkEntry.registry.map(_.name).toSet
    val ghosts = queries.Q.benchExcluded.diff(names)
    assert(ghosts.isEmpty, s"benchExcluded names not in registry: $ghosts")
    // excluded-from-bench must still have an oracle: exclusion is a
    // timing decision, never a correctness waiver
    SparkEntry.registry.filter(q => queries.Q.benchExcluded(q.name))
      .foreach(q => assert(q.oracle.nonEmpty, s"${q.name} has no oracle"))
  }

  test("oracle yardstick attaches for the recorded sf only, over the timed set") {
    val timed = SparkEntry.registry.map(_.name)
      .filterNot(queries.Q.benchExcluded)
    val at01 = Bench.oracleTimedSec(timed, "/root/testdata/sf0.1")
    assert(at01.exists(_ > 0), "recorded sf0.1 yardstick must attach")
    // excluding the audit queries must shrink the sum vs the full set
    val full = Bench.oracleTimedSec(SparkEntry.registry.map(_.name),
      "/root/testdata/sf0.1")
    assert(full.exists(f => at01.exists(t => t < f)))
    assert(Bench.oracleTimedSec(timed, "/root/testdata/sf0.01").isEmpty,
      "yardstick recorded at sf0.1 must not attach to an sf0.01 run")
  }
}
