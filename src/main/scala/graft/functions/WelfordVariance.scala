package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable online sample variance (Welford / Chan et al.
  * parallel merge) as a typed [[Aggregator]] — the engine's demonstration
  * of the custom-UDAF surface (builder brief (b): "a custom Catalyst
  * Expression / TypedColumn for scalar/agg functions"). Spark plans it as
  * a real partial/merge aggregate: `reduce` runs map-side per partition,
  * `merge` combines partition states pairwise — exactly the distributed
  * mean/M2 merge from Chan, Golub & LeVeque (1983), so no partition ever
  * sees another's raw rows.
  *
  * Built-in `var_samp` already exists (and the oracle gate uses it); this
  * class exists to pin the UDAF mechanics with a spec
  * ([[graft.functions.WelfordVarianceSpec]] asserts equality with the
  * built-in to 1e-9 relative) and to serve as the template for aggregates
  * Spark genuinely lacks.
  */
object WelfordVariance extends Aggregator[Double, WelfordState, Double] {

  override def zero: WelfordState = WelfordState(0L, 0.0, 0.0)

  override def reduce(s: WelfordState, x: Double): WelfordState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    WelfordState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: WelfordState, b: WelfordState): WelfordState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      val mean = a.mean + d * b.n / n
      WelfordState(n, mean, a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }
  }

  override def finish(s: WelfordState): Double =
    if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)

  override def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

final case class WelfordState(n: Long, mean: Double, m2: Double)
