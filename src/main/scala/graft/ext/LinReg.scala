package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form simple linear regression (ordinary least squares via the
  * normal equations) — the one-pass complement of [[LogReg]]'s iterative
  * fit: ONE map-side-combined aggregate collects the five moment means
  * (x̄, ȳ, x²̄, y²̄, x·ȳ), the driver solves the 2×2 system on five
  * doubles (the S4 scalar pattern), so cluster cost is a single scan at
  * any N.
  *
  * Determinism contract (same family as [[LogReg]]): the caller
  * pre-scales features to O(1) so the aggregated MEANS carry ~1e-14
  * cross-engine double-sum noise, the five means are pinned to 9 dp
  * before the solve, and the solve itself is +,*,/ only — IEEE-exact
  * and mirrored verbatim in the oracle SQL.
  */
object LinReg {

  /** Fit result: y ≈ slope·x + intercept, with the r² goodness of fit
    * and the row count actually aggregated.
    */
  final case class Fit(slope: Double, intercept: Double, r2: Double, n: Long)

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One fold's leave-one-out fit and held-out error. */
  final case class FoldFit(fold: Int, nTest: Long, slope: Double,
      intercept: Double, testMse: Double)

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** k-fold cross-validation of the simple OLS fit — the model-
    * selection face. TWO scans total at any N and any k:
    *
    *  1. ONE aggregate computes every fold's LEAVE-ONE-OUT training
    *     sums directly as k×4 conditional sums (never total-minus-fold
    *     driver arithmetic — subtracting two engine-summed doubles
    *     would put the cross-engine noise BEFORE the pin). Each train
    *     sum is pinned to 4 dp (sums are O(N·x̄); the caller pre-scales
    *     x,y to O(1)), then each fold's 2×2 solve is exact arithmetic.
    *  2. ONE aggregate scores every row against ITS OWN fold's model
    *     (a k-way literal CASE — codegen, no join) and averages the
    *     squared residual per fold, pinned to 6 dp.
    *
    * `foldCol` must evaluate to an integer in [0, k).
    */
  def kfoldCv(df: DataFrame, x: Column, y: Column, foldCol: Column,
      k: Int = 5): Seq[FoldFit] = {
    require(k >= 2 && k <= 16, "k in [2,16]")
    val d = df.select(x.as("x"), y.as("y"), foldCol.as("fold"))
    val aggs = (0 until k).flatMap { f =>
      val out = col("fold") =!= f
      Seq(sum(when(out, col("x"))).as(s"sx$f"),
        sum(when(out, col("y"))).as(s"sy$f"),
        sum(when(out, col("x") * col("x"))).as(s"sxx$f"),
        sum(when(out, col("x") * col("y"))).as(s"sxy$f"),
        count(when(out, lit(1))).as(s"n$f"),
        count(when(!out, lit(1))).as(s"m$f"))
    }
    val row = d.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0) || row.getLong(5) > 0,
      "empty input — no rows to cross-validate")
    val models = (0 until k).map { f =>
      val b = f * 6
      // a fold holding EVERY row leaves its train side empty (NULL
      // sums) — name the fold instead of NPE-ing on the null aggregate
      require(!row.isNullAt(b),
        s"fold $f holds every row — its leave-one-out train side is empty")
      val (sx, sy, sxx, sxy) = (round4(row.getDouble(b)),
        round4(row.getDouble(b + 1)), round4(row.getDouble(b + 2)),
        round4(row.getDouble(b + 3)))
      val n = row.getLong(b + 4).toDouble
      val mTest = row.getLong(b + 5)
      val mx = sx / n; val my = sy / n
      val vx = sxx / n - mx * mx
      require(vx > 0, s"fold $f: train x is constant")
      val cxy = sxy / n - mx * my
      val slope = cxy / vx
      (f, mTest, slope, my - slope * mx)
    }
    val slopeExpr = models.tail.foldLeft(
      when(col("fold") === models.head._1, lit(models.head._3))) {
      case (e, (f, _, sl, _)) => e.when(col("fold") === f, lit(sl))
    }
    val iceptExpr = models.tail.foldLeft(
      when(col("fold") === models.head._1, lit(models.head._4))) {
      case (e, (f, _, _, ic)) => e.when(col("fold") === f, lit(ic))
    }
    val r = col("y") - (slopeExpr * col("x") + iceptExpr)
    val mse = d.groupBy("fold").agg(avg(r * r).as("mse"))
      .collect()
      .map(rw => rw.getAs[Number](0).longValue -> rw.getDouble(1)).toMap
    models.map { case (f, mTest, sl, ic) =>
      // a fold with zero held-out rows has no mse group — report 0.0
      // with nTest = 0 rather than crashing (the caller can see the
      // empty fold from nTest)
      FoldFit(f, mTest, sl, ic,
        mse.get(f.toLong).map(round6).getOrElse(0.0))
    }
  }

  /** One aggregate pass → pinned moments → closed-form solve. `x` and
    * `y` should be pre-scaled to O(1) magnitude by the caller (the pin
    * is calibrated for means of order 1).
    */
  def fit(df: DataFrame, x: Column, y: Column): Fit = {
    val r = df.agg(
      avg(x).as("sx"), avg(y).as("sy"), avg(x * x).as("sxx"),
      avg(y * y).as("syy"), avg(x * y).as("sxy"),
      count(lit(1)).as("n")).head()
    require(!r.isNullAt(0), "empty input — no rows to fit")
    val (sx, sy, sxx, syy, sxy) =
      (round9(r.getDouble(0)), round9(r.getDouble(1)), round9(r.getDouble(2)),
        round9(r.getDouble(3)), round9(r.getDouble(4)))
    val n = r.getLong(5)
    val vx = sxx - sx * sx
    val vy = syy - sy * sy
    val cxy = sxy - sx * sy
    require(vx > 0, "x is constant — no slope to fit")
    val slope = cxy / vx
    val intercept = sy - slope * sx
    val r2 = if (vy > 0) (cxy * cxy) / (vx * vy) else 1.0
    Fit(slope, intercept, r2, n)
  }
}
