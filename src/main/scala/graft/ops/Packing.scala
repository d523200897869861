package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training writers: lay rows head-to-tail in
  * `idCol` order into fixed `budget`-token sequences, independently per
  * `shardCol` group (the unit a real pipeline packs within — a keyed
  * window, so every shard packs in parallel; a single global ORDER BY
  * would serialize on one task at 100 TB). Arithmetic stays in exact
  * integer space (`div`/`%`, never a double floor — offsets corrupt
  * past 2^53 cumulative tokens otherwise).
  */
object Packing {

  /** Adds (seq_id, seq_off): the sequence index and in-sequence offset
    * where each row's first token lands. */
  def pack(df: DataFrame, shardCol: String, idCol: String,
      tokCol: String, budget: Int): DataFrame = {
    require(budget > 0)
    require(Seq("start_off", "seq_id", "seq_off")
      .forall(!df.columns.contains(_)),
      "pack() adds seq_id/seq_off (and uses start_off internally); " +
        "rename conflicting input columns first")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_off",
        coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"start_off div $budget"))
      .withColumn("seq_off", col("start_off") % budget)
      .drop("start_off")
  }
}
