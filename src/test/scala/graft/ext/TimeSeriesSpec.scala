package graft.ext

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  test("gap-fill + linear interpolation, per-key spine bounds") {
    import spark.implicits._
    val df = Seq(
      // key "a": observed on day 1 (two events summing to 10) and day 4
      ("a", "2024-01-01 09:00:00", 4.0),
      ("a", "2024-01-01 17:00:00", 6.0),
      ("a", "2024-01-04 12:00:00", 40.0),
      // key "b": a single observation — spine is that one day, no interp
      ("b", "2024-02-10 00:00:00", 7.5)
    ).toDF("k", "ts", "v")
      .selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.gapfillInterpolate(df, "k", "ts", "v")
      .orderBy("k", "day")
      .selectExpr("k", "CAST(day AS STRING)", "value", "interp")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("a", "2024-01-01", 10.0, false),
      ("a", "2024-01-02", 20.0, true), // 10 + 30 * 1/3
      ("a", "2024-01-03", 30.0, true), // 10 + 30 * 2/3
      ("a", "2024-01-04", 40.0, false),
      ("b", "2024-02-10", 7.5, false)))
  }

  test("ewma: hand-computed smoothing with a gap and ramp-up normalization") {
    import spark.implicits._
    // days 10, 11, 13 (12 missing): day 10 has no history (ewma = x);
    // day 11 = (1*20 + 0.5*8) / 1.5; day 13 skips missing day 12 and
    // weights day 11 at 2^-2, day 10 at 2^-3
    val daily = Seq((10L, 8.0), (11L, 20.0), (13L, 4.0)).toDF("day", "x")
    val got = TimeSeries.ewma(daily, lookback = 7)
      .orderBy("day").as[(Long, Double, Double)].collect().toSeq
    val d11 = BigDecimal((1.0 * 20.0 + 0.5 * 8.0) / 1.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d13 = BigDecimal((1.0 * 4.0 + 0.25 * 20.0 + 0.125 * 8.0) / 1.375)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((10L, 8.0, 8.0), (11L, 20.0, d11), (13L, 4.0, d13)))
  }

  test("ewma: lookback truncates history") {
    import spark.implicits._
    // with lookback 2 only the current and previous day contribute
    val daily = Seq((1L, 10.0), (2L, 6.0), (3L, 2.0)).toDF("day", "x")
    val got = TimeSeries.ewma(daily, lookback = 2)
      .orderBy("day").as[(Long, Double, Double)].collect().toSeq
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 10.0, 10.0),
      (2L, 6.0, r6((1.0 * 6.0 + 0.5 * 10.0) / 1.5)),
      (3L, 2.0, r6((1.0 * 2.0 + 0.5 * 6.0) / 1.5))))
  }

  test("windows are key-partitioned: keys do not leak into each other") {
    import spark.implicits._
    // key "c" sits INSIDE key "a"'s gap; its value must not feed a's
    // interpolation, and its spine is its own single day
    val df = Seq(
      ("a", "2024-01-01 00:00:00", 0.0),
      ("c", "2024-01-02 00:00:00", 999.0),
      ("a", "2024-01-03 00:00:00", 2.0)
    ).toDF("k", "ts", "v").selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.gapfillInterpolate(df, "k", "ts", "v")
      .orderBy("k", "day")
      .selectExpr("k", "CAST(day AS STRING)", "value", "interp")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("a", "2024-01-01", 0.0, false),
      ("a", "2024-01-02", 1.0, true), // midpoint of 0 and 2 — not 999
      ("a", "2024-01-03", 2.0, false),
      ("c", "2024-01-02", 999.0, false)))
  }

  private val DayUs = 86400000000L

  test("decomposeDow recovers a planted flat trend + pure weekly cycle") {
    import spark.implicits._
    // 21 days, cents = 100000 + p[dow]; the pattern sums to 0 so the
    // centered 7-day MA of any full week is exactly 1000.00 and the
    // re-centered seasonal equals p/100 verbatim
    val p = Map(0L -> 700L, 1L -> -350L, 2L -> 0L, 3L -> 350L,
      4L -> -700L, 5L -> 175L, 6L -> -175L)
    val daily = (0L until 21L)
      .map(d => (d * DayUs, 100000L + p((d + 4) % 7)))
      .toDF("day_us", "cents")
    val got = TimeSeries.decomposeDow(daily)
      .selectExpr("day_us", "y", "trend", "seasonal", "resid")
      .as[(Long, Double, Option[Double], Double, Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(got.size === 21)
    got.foreach { case (dayUs, y, trend, seasonal, resid) =>
      val d = dayUs / DayUs
      val dow = (d + 4) % 7
      assert(y === (100000L + p(dow)) / 100.0)
      assert(seasonal === p(dow) / 100.0, s"day $d")
      if (d >= 3 && d <= 17) {
        assert(trend === Some(1000.0), s"day $d")
        assert(resid === Some(0.0), s"day $d")
      } else {
        // edge days: incomplete ±3 neighborhood → refused, not degraded
        assert(trend.isEmpty && resid.isEmpty, s"day $d")
      }
    }
  }

  test("decomposeDow refuses the MA across a calendar gap") {
    import spark.implicits._
    // days 0..10 with day 5 missing: every observed day either sits at
    // a series edge (0-2, 8-10: the calendar runs out) or straddles the
    // hole (3-4, 6-8: day 5 is inside its ±3 window) — so NO day has a
    // complete 7-day neighborhood and the trend must be null
    // everywhere, never a silently-rescaled 6-day mean
    val daily = (0L to 10L).filter(_ != 5L)
      .map(d => (d * DayUs, 1000L)).toDF("day_us", "cents")
    val got = TimeSeries.decomposeDow(daily)
      .selectExpr("day_us", "trend").as[(Long, Option[Double])]
      .collect().toSeq
    assert(got.size === 10)
    assert(got.forall(_._2.isEmpty))
  }

  test("acf of an exact alternating series: r_k = ±(n−k)/n") {
    import spark.implicits._
    // ys = ±1 exactly (cents = ±10⁸), mean 0: the numerator at lag k
    // is (n−k) signed products of ±1, the denominator is n — every
    // operand exact, so the ratios are hand-checkable
    val n = 8
    val daily = (0 until n)
      .map(d => (d.toLong * DayUs, if (d % 2 == 0) 100000000L else -100000000L))
      .toDF("day_us", "cents")
    val got = TimeSeries.acf(daily, maxLag = 3)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1, 7L, r6(-7.0 / 8.0)),
      (2, 6L, r6(6.0 / 8.0)),
      (3, 5L, r6(-5.0 / 8.0))))
  }

  test("acf pairs skip calendar holes instead of sliding over them") {
    import spark.implicits._
    // days 0,1,3 (day 2 missing): lag-1 pairs = (0,1) only — (1,3)
    // is a 2-day gap and must NOT pair at lag 1; lag-2 pairs = (1,3)
    val daily = Seq(0L, 1L, 3L).map(d => (d * DayUs, 100000000L))
      .toDF("day_us", "cents")
    val got = TimeSeries.acf(daily, maxLag = 2)
      .selectExpr("lag", "n_pairs").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1, 1L), (2, 1L)))
  }

  test("forecast backtest: hand-computed MAPE/RMSE for all three baselines") {
    import spark.implicits._
    // y_d = d+1 dollars on days 0..9, holdout = last 2 days (y=9,10):
    //   naive  : ŷ = previous day → errors 1, 1
    //   snaive : ŷ = 7 days back  → errors 7, 7
    //   ma7    : ŷ = trailing-7 mean (5 and 6 exactly) → errors 4, 4
    val daily = (0L to 9L).map(d => (d * DayUs, (d + 1) * 100L))
      .toDF("day_us", "cents")
    val got = TimeSeries.forecastBacktest(daily, holdoutDays = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      ("ma7", 2L, r6((4.0 / 9.0 + 4.0 / 10.0) / 2.0), 4.0),
      ("naive", 2L, r6((1.0 / 9.0 + 1.0 / 10.0) / 2.0), 1.0),
      ("snaive", 2L, r6((7.0 / 9.0 + 7.0 / 10.0) / 2.0), 7.0)))
  }

  test("forecast backtest: models without enough history contribute no rows") {
    import spark.implicits._
    // 5 days: snaive needs t−7 and ma7 needs a full trailing week —
    // neither can predict any holdout day; only naive reports
    val daily = (0L to 4L).map(d => (d * DayUs, 500L)).toDF("day_us", "cents")
    val got = TimeSeries.forecastBacktest(daily, holdoutDays = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got === Seq(("naive", 2L, 0.0, 0.0)))
  }

  test("cusum peaks at a planted mean shift and carries across the year partition") {
    import spark.implicits._
    // 10 equal-spaced days straddling the 365-day year boundary (days
    // 360..369): first 5 at 10.00, last 5 at 30.00 — μ = 20.00, the
    // cumulative deviation bottoms out exactly at the last low day,
    // and the ledger must carry the yr-0 partial sum into yr 1
    val daily = (360L to 369L)
      .map(d => (d * DayUs, if (d < 365) 1000L else 3000L))
      .toDF("day_us", "cents")
    val got = TimeSeries.cusumChangepoint(daily)
      .selectExpr("day_us", "y", "cusum", "is_changepoint")
      .as[(Long, Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
    val expect = Seq(-10.0, -20.0, -30.0, -40.0, -50.0,
      -40.0, -30.0, -20.0, -10.0, 0.0)
    assert(got.map(_._3) === expect)
    assert(got.filter(_._4).map(_._1) === Seq(364L * DayUs))
  }

  test("segmented trend: planted step series splits into two flat lines") {
    import spark.implicits._
    // same step fixture as the cusum test: cp lands on the last low day,
    // so segment 0 = five 10.00 days, segment 1 = five 30.00 days
    val daily = (360L to 369L)
      .map(d => (d * DayUs, if (d < 365) 1000L else 3000L))
      .toDF("day_us", "cents")
    val got = TimeSeries.segmentedTrend(daily)
      .selectExpr("segment", "n_days", "mean_daily", "slope_per_day", "intercept")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((0L, 5L, 10.0, 0.0, 10.0), (1L, 5L, 30.0, 0.0, 30.0)))
    graft.Caches.clearPersisted()
  }

  test("segmented trend: a pure linear ramp keeps slope 1 on both sides") {
    import spark.implicits._
    // y = position dollars/day — wherever CUSUM splits, both regimes
    // are the same line: slope exactly 1.0, segments partition the days
    val daily = (1L to 12L).map(d => (d * DayUs, d * 100L)).toDF("day_us", "cents")
    val got = TimeSeries.segmentedTrend(daily)
      .selectExpr("segment", "n_days", "slope_per_day", "intercept")
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._2).sum === 12L)
    assert(got.forall(_._3 === 1.0))
    // the fitted line is y = x exactly → intercept 0 in both segments
    assert(got.forall(r => math.abs(r._4) < 1e-9))
    graft.Caches.clearPersisted()
  }

  test("maseBacktest: linear ramp — exact hand-computed MASE per model") {
    import spark.implicits._
    // cents(i) = 1000 + 100·i over 42 days; holdout = last 28 →
    // train = days 0..13. In-sample snaive MAE = 700 cents (7 pairs,
    // each |Δ| = 700). Holdout MAEs: naive 100, snaive 700,
    // ma7 = mean of 7 priors = cents(t−4) → 400. MASE = MAE/700.
    val dayUs = 86400000000L
    val daily = (0 to 41).map(i => (i * dayUs, 1000L + 100L * i))
      .toDF("day_us", "cents")
    val got = TimeSeries.maseBacktest(daily, holdoutDays = 28)
      .orderBy("model").as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("ma7", 28L, 0.571429), ("naive", 28L, 0.142857),
      ("snaive", 28L, 1.0)))
    graft.Caches.clearPersisted()
  }
}
