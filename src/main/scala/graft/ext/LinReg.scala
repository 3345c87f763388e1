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

  /** One aggregate pass → pinned moments → closed-form solve. `x` and
    * `y` should be pre-scaled to O(1) magnitude by the caller (the pin
    * is calibrated for means of order 1).
    */
  def fit(df: DataFrame, x: Column, y: Column): Fit = {
    val r = df.agg(
      avg(x).as("sx"), avg(y).as("sy"), avg(x * x).as("sxx"),
      avg(y * y).as("syy"), avg(x * y).as("sxy"),
      count(lit(1)).as("n")).head()
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
