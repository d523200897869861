package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (where
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet tables (SURVEY.md §5.1). `oracle = None` →
  * driver records a weaker rows-only check.
  *
  * Contract notes (builder prompt): result column names must match the
  * oracle's exactly (driver sorts columns by name before hashing), and
  * results must be deterministic — no uuid()/current_timestamp() in
  * output, no FP-accumulation-order-dependent values (use decimal casts
  * or max/min/count-style exact aggregates).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {

  /** Queries whose `run` is not a pure dataflow: they exercise a write
    * protocol (staged publish, streaming checkpoint, file maintenance)
    * against scratch directories and are rerun-safe but EXPENSIVE to
    * repeat — [[graft.Bench]] warms them by planning only (their timed
    * run pays the real side effects exactly once per bench), and times
    * them with a single run instead of min-of-N. Kept here, next to
    * [[Q]], so the registry and this set evolve together; a spec
    * asserts every name below exists in the registry. */
  val sideEffecting: Set[String] = Set(
    "q12_incremental_load", "q13_audit_log", // staged-swap publish
    "q26_streaming_ingest", "q124_stream_stream_join", // checkpoints
    "q125_stream_window_agg", "q134_stream_upsert",
    "q156_stream_token_budget", // staged source + checkpointed complete-mode run
    "q33_csv_roundtrip", "q38_json_roundtrip", "q39_orc_roundtrip",
    "q69_schema_evolution", // format round-trips rewrite scratch files
    "q71_incremental_agg", // state v1→v2
    // q94/q96/q115 left this set in round 10, q175 in round 18: their
    // layouts/indexes build once per dataset generation behind stamped
    // fixture stores (ops/Fixtures + GraphIndex meta; FixturesSpec
    // pins the second run writes nothing), so their timed runs are
    // pure probe dataflows again. For q175 the membership itself WAS
    // the r17 "fresh-JVM floor" anomaly: side-effecting ⇒ no warmup ⇒
    // the isolated artifact timed cold codegen+JIT of the registry's
    // largest plan against an oracle that reads probe-only mirrors —
    // the same build-vs-probe asymmetry r18 closed for q168, in the
    // other direction.
    "q127_targeted_delete", "q132_time_travel",
    "q131_observed_metrics", // observed full-table copy
    "q138_persistent_ann_index", // builds + appends the stored index
    "q170_persistent_graph_index", // builds + swaps the stored graph
    // r18: the compaction family was misclassified dataflow — each
    // timed run stages a full 64-file rewrite of events and then
    // compacts + publishes it (two complete table writes); that is
    // the taxonomy's protocol definition verbatim ("staged writes /
    // publishes — durability I/O the oracle's SELECT never pays"),
    // the same reason the index builds are protocol
    "q216_compact_publish", "q219_compact_small_tail",
    "q145_xml_roundtrip", // rewrites the XML scratch copy
    "q150_ann_recall", // builds its own stored index to audit
    "q152_sql_delete_frontdoor", // rewrites its scratch table via SQL
    "q156_stream_token_budget", // streaming checkpoint + scratch copy
    "q187_stream_lm_counts", // update-mode checkpoint + batch ledger
    "q201_stream_dedup", // streaming LSH state across two micro-batches
    "q213_stream_scored_ingest", // staged waves + checkpointed seam scoring
    "q214_stream_media_ingest", // staged media waves + checkpointed image seam
    "q163_sql_insert_frontdoor", // appends to its scratch target via SQL
    "q172_sql_script_frontdoor", // whole-script staged-swap runs
    "q173_sql_script_audit") // same script runs, audit side

  /** Benchmark COST CLASS of a query — the three structurally
    * different cost regimes the spark-vs-oracle ratio mixes (r14
    * VERDICT asked for the split to ride the bench line so per-class
    * drift is visible round-over-round without re-deriving it):
    *  - `dataflow`: pure reads — compares like-with-like against the
    *    DuckDB oracle;
    *  - `streaming`: checkpointed micro-batch protocols — pays a
    *    measured planning + state-store + commit-log floor the
    *    oracle's SELECT never pays;
    *  - `protocol`: staged writes / publishes / index builds —
    *    durability I/O the oracle's SELECT never pays. */
  def cls(name: String): String =
    if (!sideEffecting(name)) "dataflow"
    else if (streaming(name)) "streaming"
    else "protocol"

  /** The checkpointed micro-batch members of [[sideEffecting]],
    * enumerated explicitly rather than derived from the name (r15
    * ADVICE: a name-substring rule misclassifies any future
    * side-effecting query that merely mentions "stream"). BenchLineSpec
    * asserts every [[sideEffecting]] name is classified here on purpose:
    * member of this set, or deliberately protocol. */
  val streaming: Set[String] = Set(
    "q26_streaming_ingest", "q124_stream_stream_join",
    "q125_stream_window_agg", "q134_stream_upsert",
    "q156_stream_token_budget", "q187_stream_lm_counts",
    "q201_stream_dedup", "q213_stream_scored_ingest",
    "q214_stream_media_ingest")

  /** Correctness-only calibration/audit queries: still verified
    * triple-green every round (they stay in the registry and the
    * oracle gate), but EXCLUDED from the timed bench, because what
    * they run is deliberately NOT the shipping operator:
    *  - q21 is the deliberately-naive full-inverted-index Jaccard
    *    kept as the teaching baseline for q78's prefix-filtered form
    *    (JaccardBaselineSpec pins the naive ↔ prefix equality; q78 is
    *    the family's benched representative);
    *  - q150/q153/q171 are RECALL AUDITS — each recomputes the
    *    brute-force truth (and q171 a full graph rebuild) to measure
    *    an approximate operator that is itself independently timed
    *    (q138 stored-IVF, q56 LSH, q68 trained IVF, q165 graph
    *    search, q166 maintenance). An audit runs when the accuracy
    *    dial turns, not per query; timing 3-4× recomputed yardstick
    *    work said nothing about the operators' cost. */
  val benchExcluded: Set[String] = Set("q21_dedup_ngram_jaccard",
    "q150_ann_recall", "q153_ann_recall_paths",
    "q171_knn_graph_maintain_audit",
    "q211_stored_graph_audit", // full construction replay to anchor the mirrors
    "q203_dedup_recall_audit", // recomputes the full candidate set to grade it
    "q204_lsh_scurve_calibration") // full truth + candidate recomputation
}
