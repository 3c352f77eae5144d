package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` — the Dataset-native UDAF entry
  * point (SURVEY.md §2.10); the untyped siblings are the
  * TypedImperativeAggregates (MinHashAgg, BloomAgg).
  */
object TypedAggs {

  final case class VarState(n: Long, mean: Double, m2: Double)

  /** Welford's online variance: numerically stable single pass,
    * mergeable partials (n, mean, M2) — the merge is Chan's parallel
    * combination, so map-side partial aggregation stays exact.
    * finish = sample variance (n-1 denominator); < 2 values -> NaN.
    * Generic over an extractor so it aggregates any typed input.
    */
  class WelfordVarianceOf[I](extract: I => Double)
      extends Aggregator[I, VarState, Double] with Serializable {
    override def zero: VarState = VarState(0L, 0.0, 0.0)

    override def reduce(s: VarState, in: I): VarState = {
      val x = extract(in)
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      VarState(n, mean, s.m2 + d * (x - mean))
    }

    override def merge(a: VarState, b: VarState): VarState = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        VarState(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }

    override def finish(s: VarState): Double =
      if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)

    override def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Plain-double variance aggregator. */
  object WelfordVariance extends WelfordVarianceOf[Double](identity)
}
