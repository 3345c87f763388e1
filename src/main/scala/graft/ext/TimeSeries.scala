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

  /** Holt double exponential smoothing (level + linear trend) with
    * α = β = 0.5 and an h-step linear forecast — the FORECASTING face
    * (q6's "revenue change" is a filter, not a forecast; ts_ewma has no
    * trend). The recursion over the aggregated daily series runs
    * driver-side: the series is CALENDAR-bounded (~10³ rows for years
    * of data) regardless of row count N, so this is the S4 scalar
    * pattern stretched to a bounded vector — the distributed work is
    * the daily aggregate feeding it.
    *
    * Determinism: the caller supplies EXACT daily values (integer-cents
    * sums — no float noise enters); α = β = 0.5 multiplications are
    * exact IEEE halvings; the recursion is then bit-identical to the
    * oracle's recursive CTE computing the same expression ORDER
    * (level first, trend from that same level value), and outputs are
    * rounded to 4 dp only at the end.
    *
    * Input: (day_us LONG, y DOUBLE). Output: in-sample rows
    * (day_us, y, level, trend, yhat — the one-step-ahead ŷ_t =
    * s_{t−1} + b_{t−1}, NULL at t=1) followed by `horizon` forecast
    * rows (future day_us, NULL y/level/trend, ŷ = s_n + h·b_n).
    */
  def holtForecast(daily: DataFrame, horizon: Int = 7): DataFrame = {
    require(horizon >= 0 && horizon <= 365, "horizon in [0,365]")
    val rows = daily.select(col("day_us"), col("y")).orderBy("day_us").collect()
    val n = rows.length
    require(n >= 2, "need at least two observations to initialize a trend")
    val dayUs = rows.map(_.getLong(0))
    val y = rows.map(_.getDouble(1))
    val s = new Array[Double](n)
    val b = new Array[Double](n)
    s(0) = y(0); b(0) = y(1) - y(0)
    var t = 1
    while (t < n) {
      val sN = 0.5 * y(t) + 0.5 * (s(t - 1) + b(t - 1))
      b(t) = 0.5 * (sN - s(t - 1)) + 0.5 * b(t - 1)
      s(t) = sN
      t += 1
    }
    def r4(x: Double): Option[Double] = Some(
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val dayMicros = 86400000000L
    val fit = (0 until n).map { i =>
      (dayUs(i), Some(y(i)), r4(s(i)), r4(b(i)),
        if (i == 0) None else r4(s(i - 1) + b(i - 1)))
    }
    val fc = (1 to horizon).map { h =>
      (dayUs(n - 1) + h * dayMicros, None: Option[Double],
        None: Option[Double], None: Option[Double], r4(s(n - 1) + h * b(n - 1)))
    }
    val spark = daily.sparkSession
    import spark.implicits._
    (fit ++ fc).toDF("day_us", "y", "level", "trend", "yhat")
      .orderBy("day_us")
  }

  private val DayUs = 86400000000L

  /** Additive seasonal decomposition y = trend + seasonal + residual
    * with day-of-week seasonality (the classical-decomposition core of
    * STL, period 7, single pass — no loess): trend is the CENTERED
    * 7-day moving average, seasonal is the per-weekday mean of the
    * detrended series re-centered to sum ≈ 0, residual is what's left.
    * The anomaly/monitoring complement of [[holtForecast]]: Holt
    * extrapolates a level+trend, this SEPARATES the weekly cycle from
    * it so a residual spike is visible through the weekday rhythm.
    *
    * Scale & plan shape: the centered MA is the bounded-offset fan-out
    * (ewma's pattern — series × 7 rows into one hash aggregate on the
    * target day), NOT a global ordered window: an unpartitioned window
    * funnels the whole series through one task (the repo bans it —
    * PlanSmellSpec), while the fan-out shuffles on the day key like any
    * aggregate. Weekday means are a 7-group aggregate; the re-center
    * grand mean is a 1-row S4 scalar crossed back broadcast.
    *
    * Determinism contract: the caller supplies EXACT integer cents, the
    * MA is an exact BIGINT sum divided once (sum/700.0 — one correctly-
    * rounded operation), the weekday is pure integer arithmetic on the
    * epoch day (no timezone/locale calendar calls on either engine),
    * and the two float aggregations (weekday mean, grand mean) are
    * pinned to 6dp before entering downstream arithmetic — the
    * established distributed-vs-single-node float rule.
    *
    * Trend (and hence residual) is NULL where the ±3-day neighborhood
    * is incomplete (series edges, or gaps in the calendar): the 7-day
    * mean over fewer than 7 days would be a different statistic, so it
    * is refused rather than silently degraded.
    *
    * Input: (day_us LONG, cents BIGINT). Output per day: (day_us,
    * y, trend, seasonal, resid), money columns 4dp, seasonal from the
    * 6dp-pinned weekday table.
    */
  def decomposeDow(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    // calendar-bounded (~10³ rows/year at any N); persisted because it
    // feeds both the MA fan-out and the day-row side of the trend join
    val base = graft.Caches.persist(daily.select(col("day_us"), col("cents")))
    // centered MA via bounded offset fan-out: each observed day sends
    // its cents to the 7 target days whose ±3-day neighborhood it
    // belongs to; a full neighborhood has exactly 7 contributors
    val offsets = (-3 to 3).map(_.toLong).toDF("o")
    val ma = base.crossJoin(broadcast(offsets))
      .groupBy((col("day_us") + col("o") * DayUs).as("day_us"))
      .agg(sum("cents").as("ma_cents"), count(lit(1)).as("ma_n"))
    val withTrend = graft.Caches.persist(base.join(ma, Seq("day_us"), "left")
      .select(col("day_us"),
        (col("cents").cast("double") / 100.0).as("y"),
        when(col("ma_n") === 7,
          col("ma_cents").cast("double") / 700.0).as("trend"),
        // integer weekday: epoch day 0 (1970-01-01) was a Thursday;
        // label it 4 so 0 = Sunday, purely arithmetically (day_us is an
        // exact DayUs multiple, so the division is exact; cast to LONG
        // keeps the grouping key integral)
        (((col("day_us") / DayUs).cast("long") + 4) % 7).as("dow")))
    val sea = withTrend.filter(col("trend").isNotNull)
      .groupBy("dow")
      .agg(round(avg(col("y") - col("trend")), 6).as("s_raw"))
    val grand = sea.agg(round(avg("s_raw"), 6).as("g"))
    val seasonal = sea.crossJoin(broadcast(grand))
      .select(col("dow"), round(col("s_raw") - col("g"), 6).as("seasonal"))
    // LEFT join: a weekday with no complete-window day anywhere (a
    // gap-riddled series) has no seasonal estimate — its days stay in
    // the output with NULL seasonal/resid rather than vanishing
    withTrend.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("day_us"), round(col("y"), 4).as("y"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("y") - col("trend") - col("seasonal"), 4).as("resid"))
      .orderBy("day_us")
  }

  /** Residual-based anomaly detection on top of [[decomposeDow]]: days
    * whose decomposition residual exceeds k·σ — the alerting face that
    * sees THROUGH trend and weekday rhythm (a Monday dip that is
    * normal for Mondays never fires; a mid-week collapse does). σ is
    * the population std of the residuals over DOLLAR-ROUNDED values
    * (exact BIGINT moment sums — residuals are 4dp-pinned doubles, so
    * a float Σr² would be engine-order-sensitive; whole-dollar
    * rounding keeps Σq² < 2⁶³ at any realistic revenue scale while
    * moving σ by < $1), 6dp-pinned before the fixed-shape z and the
    * |resid| > k·σ test. Output: flagged days only, with their
    * decomposition and z-score.
    */
  def stlResidualAnomalies(daily: DataFrame, k: Double = 3.0): DataFrame = {
    val r = graft.Caches.persist(decomposeDow(daily))
    val q = round(col("resid"), 0).cast("long")
    val sd = broadcast(r.filter(col("resid").isNotNull)
      .select(q.as("q"))
      .agg(count(lit(1)).as("n"), sum("q").as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      .select(round(sqrt(
        (col("n").cast("double") * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")) /
          (col("n").cast("double") * col("n").cast("double"))), 6)
        .as("sigma")))
    r.crossJoin(sd)
      .filter(abs(col("resid")) > lit(k) * col("sigma"))
      .select(col("day_us"), col("y"), col("trend"), col("seasonal"),
        col("resid"), round(col("resid") / col("sigma"), 4).as("z"))
      .orderBy("day_us")
  }

  /** Autocorrelation function of a daily series at lags 1..maxLag —
    * the diagnostics face that quantifies the weekly rhythm
    * [[decomposeDow]] removes and validates [[holtForecast]]'s
    * level-trend assumption: r_k = Σ_t d(t)·d(t+k) / Σ_t d(t)², with
    * d the deviation from the global mean. Pairs are joined by
    * CALENDAR lag (t, t+k days); days missing from the calendar simply
    * contribute no pair (the convention is mirrored by the oracle and
    * reported via n_pairs).
    *
    * Scale & plan shape: the lag fan-out is the bounded-offset pattern
    * (series × maxLag rows into one equi-join on the shifted day and
    * one hash aggregate per lag) — never a window, never a
    * quadratic self-join. Determinism: the series is pre-scaled to
    * O(1) (cents/10⁸ — revenue in $M), the mean is pinned to 9dp, so
    * each product is an exact-operand double and the only float-order
    * noise is the final sums' last-ulp (~1e-13 relative against the
    * 6dp output pin — the agg_moments family argument).
    *
    * Input: (day_us LONG, cents BIGINT). Output: (lag INT, n_pairs,
    * acf 6dp).
    */
  def acf(daily: DataFrame, maxLag: Int = 14): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, "maxLag in [1,64]")
    val spark = daily.sparkSession
    import spark.implicits._
    val base = daily.select(col("day_us"),
      (col("cents").cast("double") / 100000000.0).as("ys"))
    val mu = base.agg(round(avg("ys"), 9).as("mu"))
    // deviations feed the denominator scalar AND both pair sides
    val dev = graft.Caches.persist(base.crossJoin(broadcast(mu))
      .select(col("day_us"), (col("ys") - col("mu")).as("d")))
    val den = dev.agg(sum(col("d") * col("d")).as("den"))
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    val num = dev.crossJoin(broadcast(lags))
      .select(col("lag"), (col("day_us") + col("lag") * DayUs).as("day_us"),
        col("d").as("d0"))
      .join(dev.select(col("day_us"), col("d").as("dk")), Seq("day_us"))
      .groupBy("lag")
      .agg(sum(col("d0") * col("dk")).as("num"), count(lit(1)).as("n_pairs"))
    num.crossJoin(broadcast(den))
      .select(col("lag").cast("int").as("lag"), col("n_pairs"),
        round(col("num") / col("den"), 6).as("acf"))
      .orderBy("lag")
  }

  /** Rolling-origin backtest of the three RELATIONAL one-step
    * forecasters — naive (ŷ_t = y_{t−1}), seasonal-naive
    * (ŷ_t = y_{t−7}, the weekly-cycle baseline), trailing-7 moving
    * average — over the last `holdoutDays` days: the EVALUATION face
    * that tells a pipeline which baseline its fancy model
    * ([[holtForecast]]) actually has to beat, in the same units
    * (MAPE, RMSE) it will be judged by.
    *
    * Every prediction is a calendar-day shift or bounded fan-out (the
    * ewma/decompose pattern — no windows, no state); a holdout day
    * whose required history is missing from the calendar contributes
    * no row for that model (n_days reports the truth, the acf
    * convention).
    *
    * Determinism: y and every ŷ are exact integer-cent ratios; per-day
    * errors are exact-operand IEEE; only the final averages carry
    * engine-order noise and both are 6dp-pinned (RMSE pins the mean
    * square BEFORE the correctly-rounded sqrt).
    *
    * Input: (day_us LONG, cents BIGINT). Output per model:
    * (model, n_days, mape 6dp, rmse 6dp).
    */
  def forecastBacktest(daily: DataFrame, holdoutDays: Int = 28): DataFrame = {
    require(holdoutDays >= 1 && holdoutDays <= 365, "holdoutDays in [1,365]")
    val spark = daily.sparkSession
    import spark.implicits._
    val base = graft.Caches.persist(daily.select(col("day_us"), col("cents")))
    val naive = base.select(lit("naive").as("model"),
      (col("day_us") + DayUs).as("day_us"),
      (col("cents").cast("double") / 100.0).as("phat"))
    val snaive = base.select(lit("snaive").as("model"),
      (col("day_us") + lit(7L) * DayUs).as("day_us"),
      (col("cents").cast("double") / 100.0).as("phat"))
    val offs = (1 to 7).map(_.toLong).toDF("o")
    val ma7 = base.crossJoin(broadcast(offs))
      .groupBy((col("day_us") + col("o") * DayUs).as("day_us"))
      .agg(sum("cents").as("s"), count(lit(1)).as("n"))
      .filter(col("n") === 7)
      .select(lit("ma7").as("model"), col("day_us"),
        (col("s").cast("double") / 700.0).as("phat"))
    val mx = base.agg(max("day_us").as("mx"))
    val holdout = base.crossJoin(broadcast(mx))
      .filter(col("day_us") > col("mx") - lit(holdoutDays.toLong) * DayUs)
      .select(col("day_us"), (col("cents").cast("double") / 100.0).as("y"))
    naive.unionByName(snaive).unionByName(ma7)
      .join(holdout, Seq("day_us"))
      .select(col("model"), (col("y") - col("phat")).as("e"),
        (abs(col("y") - col("phat")) / col("y")).as("ape"))
      .groupBy("model")
      .agg(count(lit(1)).as("n_days"),
        round(avg("ape"), 6).as("mape"),
        round(sqrt(round(avg(col("e") * col("e")), 6)), 6).as("rmse"))
      .orderBy("model")
  }

  /** MASE evaluation of the one-step baselines (Hyndman & Koehler,
    * "Another look at measures of forecast accuracy", IJF 2006):
    * MASE_m = MAE_m(holdout) / MAE_snaive(in-sample) — the
    * scale-free yardstick that, unlike [[forecastBacktest]]'s MAPE,
    * is defined on zero-revenue days and comparable across series.
    *
    * Determinism: every error is an EXACT INTEGER at the 1/700-dollar
    * grid — naive/snaive predictions are cents·700, the MA-7
    * prediction is sum7·100 (÷7 and ÷100 fold into one exact scale),
    * the in-sample seasonal differences are |Δcents|·700 — so every
    * MAE numerator is an association-free BIGINT sum and the only
    * float ops are the two final divisions of identical exact
    * integers (the r14 discipline; headroom: daily cents·700·365 days
    * passes 2⁶³ only beyond ~$10¹⁴/day).
    *
    * @param daily (day_us, cents) exact integer daily totals
    */
  def maseBacktest(daily: DataFrame, holdoutDays: Int = 28): DataFrame = {
    require(holdoutDays >= 1 && holdoutDays <= 365, "holdoutDays in [1,365]")
    val base = graft.Caches.persist(daily.select(col("day_us"), col("cents")))
    val naive = base.select(lit("naive").as("model"),
      (col("day_us") + DayUs).as("day_us"),
      (col("cents") * lit(700L)).as("p700"))
    val snaive = base.select(lit("snaive").as("model"),
      (col("day_us") + lit(7L) * DayUs).as("day_us"),
      (col("cents") * lit(700L)).as("p700"))
    val spark = daily.sparkSession
    import spark.implicits._
    val offs = (1 to 7).map(_.toLong).toDF("o")
    val ma7 = base.crossJoin(broadcast(offs))
      .groupBy((col("day_us") + col("o") * DayUs).as("day_us"))
      .agg(sum("cents").as("s"), count(lit(1)).as("n"))
      .filter(col("n") === 7)
      .select(lit("ma7").as("model"), col("day_us"),
        (col("s") * lit(100L)).as("p700"))
    val mx = broadcast(base.agg(max("day_us").as("mx")))
    val cut = col("mx") - lit(holdoutDays.toLong) * DayUs
    val holdout = base.crossJoin(mx).filter(col("day_us") > cut)
      .select(col("day_us"), (col("cents") * lit(700L)).as("y700"))
    val num = naive.unionByName(snaive).unionByName(ma7)
      .join(holdout, Seq("day_us"))
      .select(col("model"), abs(col("y700") - col("p700")).as("e700"))
      .groupBy("model")
      .agg(count(lit(1)).as("n_days"), sum("e700").as("se"))
    val train = base.crossJoin(mx).filter(col("day_us") <= cut)
    val den = broadcast(train
      .join(train.select((col("day_us") + lit(7L) * DayUs).as("day_us"),
        col("cents").as("c7")), Seq("day_us"))
      .select((abs(col("cents") - col("c7")) * lit(700L)).as("d700"))
      .agg(count(lit(1)).as("dn"), sum("d700").as("sd")))
      // in-plan guard (r14 ADVICE + r15 review): a series shorter than
      // holdoutDays+8 leaves the in-sample seasonal-diff denominator
      // EMPTY (dn=0, sd null), and a perfectly 7-day-periodic training
      // window leaves it ZERO (dn>0, sd=0) — either way MASE is
      // undefined (null or ±Infinity downstream); fail loudly instead
      // — the betweenness d9 raise_error discipline
      .select(when(col("dn") === 0L || col("sd") === 0L, raise_error(lit(
          "maseBacktest: degenerate in-sample seasonal denominator — " +
            "series must span holdoutDays + 8 days and not be exactly " +
            "7-day periodic over the training window")))
          .otherwise(col("dn")).as("dn"),
        col("sd"))
    num.crossJoin(den)
      .select(col("model"), col("n_days"),
        round((col("se").cast("double") / col("n_days").cast("double")) /
          (col("sd").cast("double") / col("dn").cast("double")), 6).as("mase"))
      .orderBy("model")
  }

  /** CUSUM change-point statistic over a daily series (Page 1954, the
    * offline mean-shift form): C_t = Σ_{i≤t}(y_i − ȳ) — the cumulative
    * deviation from the global mean — peaks in magnitude AT the change
    * point. Output flags the (first, by day) maximal |C_t|.
    *
    * Scale & plan shape: the running total is a DISTRIBUTED two-phase
    * prefix sum ([[PrefixSum.scan]], 365-day buckets), not a global
    * ordered window: cents cumsum WITHIN each year partition
    * (partitioned window — bounded per-task state), then each year adds
    * the broadcast total of all PRIOR years (the year ledger is
    * calendar-bounded, a classic S4 scalar table). Exactly the
    * carry-propagate scan a 1000-executor cluster wants.
    *
    * Determinism contract: all cumulative arithmetic is EXACT BIGINT
    * cents (prefix sums of integers are association-free — no float
    * order noise anywhere); the only division is the final
    * C_t = (cum_cents − t·μ_cents)/100 where μ = total/n is pinned to
    * 6dp dollars first. The argmax tie-break is (|C| desc, day asc),
    * and |C| comparisons happen on the 4dp-pinned value so both
    * engines rank identical operands.
    *
    * Input: (day_us LONG, cents BIGINT). Output per day: (day_us, y,
    * cusum 4dp, is_changepoint).
    */
  def cusumChangepoint(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    // calendar-bounded; persisted — it feeds the prefix scan AND the
    // global-mean scalar
    val base = graft.Caches.persist(
      daily.select(col("day_us"), col("cents"), lit(1L).as("one")))
    // the two running totals (cents, position) ride ONE PrefixSum scan;
    // 365-day buckets make the ledger a ≤ #years broadcast
    val scanned = PrefixSum.scan(base, "day_us", Seq("cents", "one"),
      bucketSize = DayUs * 365L)
    val tot = base.agg(
      round(sum("cents").cast("double") / 100.0 /
        count(lit(1)).cast("double"), 6).as("mu"))
    // persisted: the series feeds the peak scalar, the first-day argmin,
    // AND the final output — one materialization, registry-tracked
    val cs = graft.Caches.persist(scanned
      .crossJoin(broadcast(tot))
      .select(col("day_us"),
        round(col("cents").cast("double") / 100.0, 4).as("y"),
        // + 0.0 post-pin: a cusum that rounds to zero from below must
        // leave as +0.0 on both engines (r13 signed-zero sweep)
        (round(col("cum_cents").cast("double") / 100.0 -
          col("cum_one").cast("double") * col("mu"), 4) + lit(0.0))
          .as("cusum")))
    // argmax via self-agg: the peak magnitude is a 1-row scalar; the
    // FIRST day attaining it is the change point
    val pkv = cs.agg(max(abs(col("cusum"))).as("pk"))
    val firstDay = cs.crossJoin(broadcast(pkv))
      .filter(abs(col("cusum")) === col("pk"))
      .agg(min("day_us").as("cp_day"))
    cs.crossJoin(broadcast(firstDay))
      .select(col("day_us"), col("y"), col("cusum"),
        (col("day_us") === col("cp_day")).as("is_changepoint"))
      .orderBy("day_us")
  }

  /** Piecewise-linear trend around the CUSUM change point: the series
    * splits into the two regimes [[cusumChangepoint]] detects (segment
    * 0 ≤ change day < segment 1) and each gets an exact OLS line — the
    * "did the trend actually change, and by how much" readout a mean-
    * shift flag alone can't give.
    *
    * Determinism: x = the series position from the SAME distributed
    * PrefixSum scan the CUSUM rides (exact BIGINT), so the per-segment
    * normal-equation sums (Σx, Σy, Σxy, Σx²) are exact integer hash
    * aggregates; slope = one fixed-shape division pinned to 6dp, and
    * the intercept is derived from the PINNED slope and the two means
    * (fixed shape) — no float accumulation order anywhere. Scale: one
    * scan to the calendar-bounded daily table, one ≤2-group aggregate.
    * Output per segment: (segment, n_days, start/end day, mean_daily,
    * slope_per_day, intercept) in dollars.
    */
  def segmentedTrend(daily: DataFrame): DataFrame = {
    val base = graft.Caches.persist(
      daily.select(col("day_us"), col("cents"), lit(1L).as("one")))
    val scanned = PrefixSum.scan(base, "day_us", Seq("cents", "one"),
      bucketSize = DayUs * 365L)
    val cp = broadcast(cusumChangepoint(daily)
      .filter(col("is_changepoint")).select(col("day_us").as("cp_day")))
    val seg = scanned.crossJoin(cp)
      .select(when(col("day_us") <= col("cp_day"), 0L).otherwise(1L)
        .as("segment"),
        col("day_us"), col("cents"), col("cum_one").as("x"))
    val a = seg.groupBy("segment").agg(count(lit(1)).as("n_days"),
      min("day_us").as("start_day_us"), max("day_us").as("end_day_us"),
      sum("x").as("sx"), sum("cents").as("sy"),
      sum(col("x") * col("cents")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    // single-day segment (changepoint on the first/last day): the OLS
    // denominator n·Σx²−(Σx)² is 0, so 0/0 would propagate NaN — emit
    // NULL slope/intercept instead (the Mann-Whitney degenerate-input
    // rule; r12 ADVICE), mirrored in the oracle
    val slope6 = when(col("n_days") > 1, round(
      (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double") /
        lit(100.0), 6))
    val meanY = col("sy").cast("double") / col("n_days").cast("double") / lit(100.0)
    val meanX = col("sx").cast("double") / col("n_days").cast("double")
    a.withColumn("slope6", slope6)
      .select(col("segment"), col("n_days"), col("start_day_us"),
        col("end_day_us"),
        round(meanY, 4).as("mean_daily"),
        round(col("slope6"), 4).as("slope_per_day"),
        round(meanY - col("slope6") * meanX, 4).as("intercept"))
      .orderBy("segment")
  }
}
