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
}
