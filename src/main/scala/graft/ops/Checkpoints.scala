package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for the ITERATIVE operators
  * ([[KnnGraph]], [[Dedup.connectedComponents]]) — each round must
  * checkpoint or the logical plan grows ~5× per round (driver
  * analysis measured at 40s for a 2-round graph build left lazy).
  *
  * Two implementations, one switch:
  *  - **local (default)**: `localCheckpoint` — blocks live in executor
  *    storage, zero external I/O. Right for local mode and for
  *    clusters where recomputing a lost build is acceptable: the
  *    blocks are NON-RELIABLE, so on a real cluster an executor loss
  *    mid-build loses partitions and the job recomputes from nothing.
  *  - **reliable**: `checkpoint` against a configured directory
  *    (HDFS/object store) — each round's state is written out, so an
  *    executor loss recomputes at most one round. The production
  *    setting for multi-round builds over 100 TB corpora, at the cost
  *    of one round-sized write per round.
  *
  * `enableReliable` is process-wide (it configures the
  * SparkContext's checkpoint dir, which is context-global anyway);
  * operators call [[truncate]] and inherit whichever policy the
  * deployment chose. */
object Checkpoints {

  @volatile private var reliable: Boolean = false

  @volatile private var explain: Boolean = false

  /** EXPLAIN-ONLY mode (r18, closing PLAN_AUDIT's construction blind
    * spot): [[truncate]] becomes identity, so an iterative build's
    * FULL per-round plan stays in the logical tree and
    * `explain("formatted")` can print the construction shapes that
    * checkpointing normally hides (the most-rewritten dataflow in the
    * repo — TopKEdgesAgg ranking, attach-form refinement). Never
    * enable for real execution: the per-round ~5× logical-plan growth
    * this module exists to stop comes straight back. Process-wide,
    * like the reliable switch. */
  def enableExplainMode(): Unit = explain = true

  def disableExplainMode(): Unit = explain = false

  /** True while explain mode is on — operators that release bounded
    * caches before returning (the searchLayers pins) keep them
    * registered instead, so the audited plan shows the
    * InMemoryRelation leaves the EXECUTED plan really has. */
  def explainEnabled: Boolean = explain

  /** Route subsequent [[truncate]] calls through RELIABLE
    * checkpointing into `dir` (sets the context checkpoint dir). */
  def enableReliable(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    spark.sparkContext.setCheckpointDir(dir)
    reliable = true
  }

  /** Back to executor-local checkpointing (the default). */
  def disableReliable(): Unit = reliable = false

  def reliableEnabled: Boolean = reliable

  /** Truncate `df`'s lineage under the active policy. Semantics are
    * identical either way — only failure-recovery cost differs. */
  def truncate(df: DataFrame, eager: Boolean): DataFrame =
    if (explain) df
    else if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)

  /** Truncation for ACTION-DRIVEN loops (convergence checks execute
    * every round during DataFrame CONSTRUCTION —
    * [[Dedup.connectedComponents]]): explain mode keeps real
    * truncation here, because identity would grow the EXECUTED plan
    * ~4× per round (the jump self-joins) for no explain-side payoff —
    * the rounds run as jobs while the DataFrame is being built either
    * way, so the final explain can never show more than the last
    * round's shape. Fixed-round builds ([[KnnGraph]]) use [[truncate]]
    * and DO print their full construction under explain mode. */
  def truncateDriven(df: DataFrame, eager: Boolean): DataFrame =
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
}
