package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TABLE CHECKSUM / REPLICA-DIVERGENCE DETECTION: order-free per-bucket
  * fingerprint sums over a keyed table, so two copies (primary/replica,
  * pre/post-migration, two cluster regions) can be compared by
  * exchanging `buckets` rows instead of the table — the Merkle-repair
  * idea flattened to one level. Each row contributes a deterministic
  * 60-bit content hash; a bucket's checksum is the BIT_XOR of its rows'
  * hashes (commutative, associative, no overflow), so it is invariant
  * to partitioning and row order, and any single-row difference flips
  * the bucket's checksum with probability 1 − 2⁻⁶⁰. One scan per side,
  * one tiny shuffle (bucket count), then a bucket-keyed comparison of
  * two `buckets`-row relations — at 100 TB the repair path re-reads
  * only the diverged buckets' key ranges, never the whole table.
  */
object TableChecksum {

  /** (bucket, checksum, n_rows) — `fp` must be a deterministic BIGINT
    * row fingerprint (e.g. Hash60 over a canonical concat of the
    * row's columns), `bucket` a deterministic row → [0, buckets) map
    * (e.g. key % buckets). */
  def checksums(df: DataFrame, bucket: Column, fp: Column): DataFrame =
    df.select(bucket.as("bucket"), fp.as("fp"))
      .groupBy(col("bucket"))
      .agg(expr("bit_xor(fp)").as("checksum"),
        count(lit(1)).as("n_rows"))

  /** Buckets where the two sides disagree (missing buckets count as
    * diverged). Output: bucket, checksum_a, checksum_b, rows_a,
    * rows_b — the repair worklist. */
  def diverged(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.toDF("bucket_b", "checksum_b", "rows_b")
    a.toDF("bucket", "checksum_a", "rows_a")
      .join(bb, col("bucket") === col("bucket_b"), "full_outer")
      .filter(!(col("checksum_a") <=> col("checksum_b"))
        || !(col("rows_a") <=> col("rows_b")))
      .select(coalesce(col("bucket"), col("bucket_b")).as("bucket"),
        col("checksum_a"), col("checksum_b"),
        col("rows_a"), col("rows_b"))
  }
}
