package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch gradient-descent training for a linear classifier —
  * the TRAINING face of the pipeline (the existing `quality_classifier`
  * query is scoring-only). Extension surface beyond the reference (its
  * notebook trains nothing); a curation pipeline at 100 TB fits its
  * quality/language classifiers on the cluster with exactly this shape:
  * each iteration is ONE whole-data aggregate (the per-row gradient
  * contributions combine map-side, so the shuffle carries d+2 doubles
  * per partition, never rows), and the weight vector is a driver-side
  * scalar (the S4 pattern — fixed size, independent of N).
  *
  * Two deliberate determinism choices make the fit oracle-checkable:
  *  - the link is the rational "fast sigmoid" 0.5 + 0.5·t/(1+|t|) —
  *    only +,*,/,abs, all IEEE-exact and identical in DuckDB, where
  *    exp/ln are not correctly rounded and may drift per-row between
  *    libm implementations;
  *  - the aggregated gradient and the updated weights are pinned to
  *    6 dp each iteration (the established graph_pagerank operand-
  *    pinning pattern), so double-sum association order — the one
  *    remaining engine difference — cannot compound across iterations.
  */
object LogReg {

  /** One training step's outcome: weights AFTER the update and the
    * training accuracy measured WITH those updated weights.
    */
  final case class Step(iter: Int, weights: Seq[Double], bias: Double,
      accuracy: Double)

  /** p(t) = 0.5 + 0.5 * t / (1 + |t|) — strictly increasing, p(0)=0.5,
    * range (0,1); the decision boundary p>0.5 is exactly t>0.
    */
  def fastSigmoid(t: Column): Column =
    lit(0.5) + lit(0.5) * t / (lit(1.0) + abs(t))

  /** Fit by full-batch gradient descent. `features` are Column
    * expressions over `df` (pre-scaled by the caller); `label` must
    * evaluate to 0.0/1.0. Returns one [[Step]] per iteration.
    *
    * Each iteration runs ONE aggregate pass computing the gradient at
    * the current weights AND the accuracy of those weights (both need
    * the same per-row margin t, so they share a scan); a final extra
    * pass scores the last update. Total passes = iters + 1, each a
    * map-side-combined average — at any scale the driver materializes
    * exactly (d+2) doubles per pass.
    */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
      lr: Double = 1.0, iters: Int = 3): Seq[Step] = {
    require(iters >= 1 && iters <= 20, "iters in [1,20] — fixed unrolled loop")
    val d = features.size
    // HALF_UP to match both Spark's `round` and DuckDB's `round`
    // (half-away-from-zero) — `math.rint` would be half-EVEN and
    // diverge from the oracle exactly on the boundaries pins exist for.
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // margin t at given weights, as a pure-arithmetic Column
    def margin(w: Seq[Double], b: Double): Column =
      features.zip(w).map { case (f, wi) => f * lit(wi) }
        .foldLeft(lit(b): Column)(_ + _)

    // One combined pass: gradient AND accuracy at the same weights —
    // both need the per-row margin t, so they share the scan. The
    // gradient@w_i drives the update to w_{i+1}; the accuracy@w_i is
    // reported against the step that PRODUCED w_i, so pass i+1 closes
    // out step i and the loop ends with an accuracy-only pass for the
    // last update. Total passes = iters + 1.
    def pass(w: Seq[Double], b: Double): (Seq[Double], Double, Double) = {
      val t = margin(w, b)
      val err = fastSigmoid(t) - label
      val aggs =
        features.zipWithIndex.map { case (f, i) => avg(err * f).as(s"g$i") } ++
          Seq(avg(err).as("gb"),
            avg(when((t > 0) === (label > 0.5), 1.0).otherwise(0.0)).as("acc"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      require(!row.isNullAt(0), "empty input — no rows to fit")
      ((0 until d).map(i => round6(row.getDouble(i))),
        round6(row.getDouble(d)), round6(row.getDouble(d + 1)))
    }

    var w = Seq.fill(d)(0.0)
    var b = 0.0
    val steps = Seq.newBuilder[Step]
    var pending: Option[(Int, Seq[Double], Double)] = None
    for (it <- 1 to iters) {
      val (g, gb, acc) = pass(w, b)
      pending.foreach { case (pi, pw, pb) => steps += Step(pi, pw, pb, acc) }
      w = w.zip(g).map { case (wi, gi) => round6(wi - lr * gi) }
      b = round6(b - lr * gb)
      pending = Some((it, w, b))
    }
    val (_, _, accLast) = pass(w, b)
    pending.foreach { case (pi, pw, pb) => steps += Step(pi, pw, pb, accLast) }
    steps.result()
  }
}
