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
