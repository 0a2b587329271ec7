package graft.functions

import graft.functions.expressions.{CosineSimilarity, DotProduct, L2Distance}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dense-vector math over `array<float>` / `array<double>` embedding
 * columns.
 *
 * The hot-path kernels (dot, cosine, L2) are native Catalyst
 * expressions with fused codegen loops
 * ([[graft.functions.expressions.VectorBinaryExpression]]) — one pass,
 * no intermediate arrays, inside whole-stage codegen. The composed
 * `zip_with`/`aggregate` forms are kept as `*Composed` reference
 * implementations (and for property-testing the native kernels
 * against).
 */
object VectorFunctions {

  private def expr(c: Column) = ColumnBridge.expression(c)

  /** Σ aᵢ·bᵢ — native codegen kernel. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** cosine(a, b) ∈ [-1, 1]; 0 when either norm is 0 — native kernel. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(expr(a), expr(b)))

  /** ‖a − b‖₂ — native kernel. */
  def l2Distance(a: Column, b: Column): Column =
    ColumnBridge.column(L2Distance(expr(a), expr(b)))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  // ---- composed reference implementations (higher-order functions) ----

  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def cosineComposed(a: Column, b: Column): Column = {
    val d = dotComposed(a, b)
    val n = sqrt(dotComposed(a, a)) * sqrt(dotComposed(b, b))
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  // ---- sketches --------------------------------------------------------

  /** KMV distinct-count sketch aggregate (see
    * [[graft.functions.expressions.KmvDistinct]]). */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      graft.functions.expressions.KmvDistinct(expr(c), k).toAggregateExpression())

  /** Space-Saving heavy-hitters sketch aggregate (see
    * [[graft.functions.expressions.SpaceSavingTopK]]). */
  def topkSketch(c: Column, k: Int = 10, capacity: Int = 1024): Column =
    ColumnBridge.column(
      graft.functions.expressions.SpaceSavingTopK(expr(c), k, capacity)
        .toAggregateExpression())

  // ---- LSH bucketing ---------------------------------------------------

  /**
   * Deterministic pseudo-random hyperplane `p` of dimension `dim` for
   * sign-LSH: component j is a hash-derived value in [-0.5, 0.5). Used
   * for random-hyperplane (SimHash-for-vectors) bucketing — two vectors
   * with high cosine land in the same sign bucket with high probability
   * (Charikar, STOC'02).
   *
   * Component j derives from md5("{seed}_{p}_{j}"): first 15 hex chars
   * as a 60-bit int, mod 10^6, scaled to [-0.5, 0.5). md5 — not an
   * engine-private hash like xxhash64 — so ANY engine can recompute the
   * exact buckets; the DuckDB correctness oracle replays the full LSH
   * bucketing in SQL:
   * {{{
   *   (CAST('0x' || substr(md5(seed || '_' || p || '_' || j), 1, 15)
   *     AS BIGINT) % 1000000) / 1000000.0 - 0.5
   * }}}
   * Values are computed once driver-side and inlined as an array
   * literal, so the per-row cost is a single fused dot product.
   */
  def hyperplaneValues(seed: Long, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_${p}_$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L) /
        1000000.0 - 0.5
    }

  def hyperplane(seed: Long, p: Int, dim: Int): Column =
    typedlit(hyperplaneValues(seed, p, dim).toSeq)

  /** `nBits`-bit sign-LSH bucket id of vector `v`. */
  /** `nBits`-bit sign-LSH bucket id of vector `v` — one native
    * [[graft.functions.expressions.SignLshBuckets]] kernel. The former
    * composed form (a `when(dot(...))` term per bit) built an nBits-dot
    * expression tree whose generated code, fused into a join stage,
    * blew janino's method limits and dropped the whole stage to
    * interpreted evaluation. */
  def signLshBucket(v: Column, dim: Int, nBits: Int, seed: Long = 7L): Column =
    element_at(signLshBuckets(v, dim, nBits, Seq(seed)), 1)

  /** All tables' bucket ids at once: element t is the `nBits`-bit sign
    * bucket under `seeds(t)`'s hyperplane set — `posexplode` it for the
    * (tbl, bucket) pairs the multi-table LSH join consumes. */
  def signLshBuckets(v: Column, dim: Int, nBits: Int,
      seeds: Seq[Long]): Column = {
    val planes: Array[Double] = seeds.toArray.flatMap(s =>
      (0 until nBits).flatMap(p => hyperplaneValues(s, p, dim)))
    ColumnBridge.column(graft.functions.expressions.SignLshBuckets(
      expr(v), planes, nBits, seeds.size))
  }
}
