package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity primitives over `ArrayType(FloatType)` columns,
  * built on higher-order functions (`zip_with`/`aggregate`) — codegen'd,
  * no UDFs (SURVEY.md §2.10).
  *
  * Exactness: floats are scaled to integers (round(x·10⁶)) first, so dot
  * products and norms are exact 64-bit sums — ORDER-FREE, which makes
  * results bit-identical across engines and across Spark partitionings
  * (a float sum would depend on accumulation order). The only floating
  * ops are one final divide + sqrt, both IEEE-deterministic. Magnitudes:
  * |x| ≤ ~10³ scales to ≤ 10⁹; squared ≤ 10¹⁸ in sums of 64 dims still
  * within 2⁶³ for unit-norm-ish embeddings (|x| ≤ ~10 in practice).
  */
object Similarity {

  /** float vector → exact integer vector at 1e6 scale. */
  def intVec(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("bigint"))

  /** exact integer dot product (order-free). */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** exact squared norm of an integer vector. */
  def norm2(a: Column): Column = dotLong(a, a)

  /** cosine from precomputed integer vectors + double norms:
    * dot/sqrt(na·nb) — one divide, one sqrt, deterministic. NULL when
    * either norm is zero (try_divide, ANSI-safe), matching
    * [[graft.functions.CosineScaled]]. */
  def cosineFrom(ivA: Column, ivB: Column, nrmA: Column, nrmB: Column): Column =
    try_divide(dotLong(ivA, ivB).cast("double"), sqrt(nrmA * nrmB))
}
