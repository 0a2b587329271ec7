package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dense-vector math over `array<float>` embedding columns, composed from
 * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
 * so the whole similarity pipeline stays in Tungsten-generated code.
 *
 * All arithmetic is done in Double for precision; inputs are float
 * arrays as produced by every embedding pipeline (FIXTURES.md §4,
 * `embeddings.embedding list<float>`).
 */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** cosine(a, b) ∈ [-1, 1]; null-safe 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** ‖a − b‖₂ */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast(DoubleType) - y.cast(DoubleType)
      diff * diff
    }), lit(0.0), (acc, x) => acc + x))

  /**
   * Deterministic pseudo-random hyperplane `p` of dimension `dim` for
   * sign-LSH: component j is a hash-derived value in [-0.5, 0.5). Used
   * for random-hyperplane (SimHash-for-vectors) bucketing — two vectors
   * with high cosine land in the same sign bucket with high probability
   * (Charikar, STOC'02).
   */
  def hyperplane(seed: Long, p: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(xxhash64(lit(seed), lit(p), j), lit(1000000L)).cast(DoubleType)
        / 1000000.0) - 0.5)

  /** `nBits`-bit sign-LSH bucket id of vector `v`. */
  def signLshBucket(v: Column, dim: Int, nBits: Int, seed: Long = 7L): Column =
    (0 until nBits).map { p =>
      when(dot(v, hyperplane(seed, p, dim)) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
