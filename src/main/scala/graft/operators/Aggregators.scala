package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed custom aggregators (`Aggregator[IN, BUF, OUT]`) — the engine's
 * user-defined-aggregate surface (SURVEY §2.5 last row: the reference's
 * extension points are its Lambdas; ours are typed aggregators that
 * Catalyst plans as partial + final aggregation like any built-in, so
 * they map-side combine and never collect to the driver).
 */
object Aggregators {

  /** Exact weighted mean via (Σwx, Σw) partial sums — decimal-exact
    * merge order independence comes from summing cents as Long. */
  case class WSum(var sumWxCents: Long, var sumWCents: Long)

  /** IN = (value cents, weight cents) pair packed as a tuple. */
  class WeightedMean extends Aggregator[(Long, Long), WSum, Double] {
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, a: (Long, Long)): WSum = {
      b.sumWxCents += a._1 * a._2
      b.sumWCents += a._2
      b
    }
    override def merge(x: WSum, y: WSum): WSum =
      WSum(x.sumWxCents + y.sumWxCents, x.sumWCents + y.sumWCents)
    override def finish(r: WSum): Double =
      if (r.sumWCents == 0) 0.0 else r.sumWxCents.toDouble / r.sumWCents
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Numerically stable streaming variance (Welford / Chan parallel
    * merge) — the classic mergeable-summary shape. */
  case class Moments(var n: Long, var mean: Double, var m2: Double)

  class VarianceAgg extends Aggregator[Double, Moments, Double] {
    override def zero: Moments = Moments(0L, 0.0, 0.0)
    override def reduce(b: Moments, x: Double): Moments = {
      b.n += 1
      val d = x - b.mean
      b.mean += d / b.n
      b.m2 += d * (x - b.mean)
      b
    }
    override def merge(a: Moments, b: Moments): Moments = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Moments(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(r: Moments): Double =
      if (r.n < 2) 0.0 else r.m2 / (r.n - 1)
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
