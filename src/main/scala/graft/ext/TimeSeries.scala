package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular per-key event stream
  * into a dense daily series — the feature-prep step every
  * training-data pipeline runs before windowed models (demand curves,
  * activity rates) can consume tabular history.
  *
  * Two classic halves, composed here:
  *   1. gap-fill: per key, a calendar spine from the key's first to
  *      last observed day (`sequence` + `explode` — spine rows are
  *      generated distributed, never on the driver);
  *   2. linear interpolation: each missing day takes
  *      v = pv + (nv − pv) · (d − pd)/(nd − pd) between its previous
  *      (pd, pv) and next (nd, nv) observed days, found with
  *      IGNORE-NULLS running last/first windows.
  *
  * Scale: one shuffle on the key for the daily aggregate, one for the
  * per-key windows (both partitioned — no global window); spine size is
  * keys × days, linear in the calendar, not in the events. The four
  * window passes share one partitioning, so Catalyst plans a single
  * exchange. Determinism: daily sums are rounded to 2dp BEFORE
  * interpolation so the interpolation arithmetic sees identical
  * operands in any engine; the oracle mirrors the operand order
  * exactly.
  */
object TimeSeries {

  /** Dense daily series for `df` grouped by `key`: one row per (key,
    * day) from each key's first to last observed day, summing `value`
    * on observed days and linearly interpolating the rest.
    * Output: (key, day, value 4dp, interp flag), day as a DATE column.
    */
  def gapfillInterpolate(df: DataFrame, key: String, ts: String,
      value: String): DataFrame = {
    val daily = df
      .select(col(key), to_date(col(ts)).as("day"), col(value).as("__v"))
      .groupBy(col(key), col("day"))
      .agg(round(sum("__v"), 2).as("v"))
    val spine = daily
      .groupBy(col(key)).agg(min("day").as("d0"), max("day").as("d1"))
      .select(col(key), explode(sequence(col("d0"), col("d1"))).as("day"))
    val joined = spine.join(daily, Seq(key, "day"), "left")

    val w = Window.partitionBy(key).orderBy("day")
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay: Column = when(col("v").isNotNull, col("day"))
    val pv = last(col("v"), ignoreNulls = true).over(back)
    val pd = last(obsDay, ignoreNulls = true).over(back)
    val nv = first(col("v"), ignoreNulls = true).over(fwd)
    val nd = first(obsDay, ignoreNulls = true).over(fwd)
    // mirror of the oracle's operand order: frac first, one multiply,
    // one add — any re-association could split the last ulp before the
    // 4dp rounding
    val frac = datediff(col("day"), pd).cast("double") /
      datediff(nd, pd).cast("double")
    joined
      .withColumn("value",
        round(when(col("v").isNotNull, col("v"))
          .otherwise(pv + (nv - pv) * frac), 4))
      .withColumn("interp", col("v").isNull)
      .select(col(key), col("day"), col("value"), col("interp"))
  }

  /** Finite-lookback exponentially weighted moving average (Holt's
    * simple exponential smoothing truncated to `lookback` terms): for
    * each observed day d,
    *   ewma(d) = Σ_{o=0..L-1} w_o · x(d−o)  /  Σ_{o: x(d−o) exists} w_o
    * with w_o = 2^{−o} (α = 0.5) — the smoothed level a monitoring
    * pipeline compares today's volume against. Missing history days
    * contribute nothing and leave the normalizer (the standard
    * "available history" normalization, pandas `ewm(adjust=True)`).
    *
    * Determinism contract: the weights are an EXPLICIT literal table
    * (exact binary fractions 1, 0.5, … — no libm `pow` on either
    * engine), daily sums are pinned to 6dp before weighting, and the
    * weighted sum has ≤ `lookback` pinned addends.
    *
    * Scale: the offset fan-out is the bounded-explode pattern
    * (`events_dau_wau`'s trailing-7 shape): series × L rows into one
    * hash aggregate on the target day — never a self-join of the
    * series, never a window whose frame an engine must buffer. One
    * shuffle on (key, day), L a small constant.
    *
    * @param daily (day: long epoch-day, x: double) — pre-aggregated
    *              daily series; `x` should already be deterministic
    * @return (day, x, ewma 6dp) for each observed day
    */
  def ewma(daily: DataFrame, lookback: Int = 7): DataFrame = {
    require(lookback >= 1 && lookback <= 62, "lookback out of range")
    val spark = daily.sparkSession
    import spark.implicits._
    // exact binary fractions: 2^-o is exactly representable, and
    // 1.0/(1L<<o) is correctly rounded (exact) in IEEE — identical to
    // the oracle's literal VALUES rows
    val weights = (0 until lookback).map(o => (o.toLong, 1.0 / (1L << o)))
      .toDF("o", "w")
    val contrib = daily.crossJoin(broadcast(weights))
      .select((col("day") + col("o")).as("day"),
        col("w"), (col("w") * col("x")).as("wx"))
    val sm = contrib.groupBy("day")
      .agg(sum("wx").as("num"), sum("w").as("den"))
    daily.join(sm, Seq("day"))
      .select(col("day"), col("x"), round(col("num") / col("den"), 6).as("ewma"))
  }
}
