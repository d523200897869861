package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-1 parity: the schema-generic CSV→Parquet transformer
  * (ref `csv_to_parquet_transformer.py:1-19`; SURVEY.md §2 P1,P2,D1,A5,
  * S1,S2). Each step is a lazy DataFrame transformation; the pandas
  * eager pipeline becomes scan → normalize → dedup → sink with exactly
  * one shuffle (the dropDuplicates hash-repartition on all columns).
  */
object Normalize {

  /** P1 — bulk lowercase column rename (ref py:6). Metadata-only: no
    * job, no shuffle; the parquet scan still prunes by original name. */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** P2 — fillna(0) (ref py:7). Decided semantics (SURVEY §7.4.1):
    * numerics get 0, strings get "0" — pandas writes int 0 into string
    * columns; we match the typed-engine idiom and the DuckDB oracle
    * encodes the same contract. */
  def fillNulls(df: DataFrame): DataFrame =
    df.na.fill(0).na.fill("0")

  /** A5 — duplicate count (ref py:9, `df.duplicated().sum()`).
    * Two jobs over one scan; at scale prefer the groupBy form below
    * which counts in one pass. */
  def duplicateCount(df: DataFrame): Long =
    df.count() - df.dropDuplicates().count()

  /** A5 one-pass variant: one shuffle, map-side partial aggregation. */
  def duplicateCountDF(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col): _*).count()
      .agg(coalesce(sum(col("count") - 1), lit(0L)).as("dup_count"))

  /** D1 — exact full-row dedup (ref py:11-15). Hash-partition on all
    * columns; at 100 TB this is the exact-dedup primitive (shuffle is
    * unavoidable but map-side combine drops dupes early). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** The whole file-1 pipeline (ref py:3-18): normalize names, fill
    * nulls, drop exact duplicates. CSV read + parquet write live at the
    * call site (S1/S2) so the transform itself is source-agnostic —
    * the reference pipeline is schema-generic by design. */
  def run(df: DataFrame): DataFrame =
    dedup(fillNulls(lowercaseColumns(df)))
}
