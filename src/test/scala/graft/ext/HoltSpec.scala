package graft.ext

import graft.SparkSpec

class HoltSpec extends SparkSpec {

  test("exact linear series: level tracks, trend locks to the slope, forecast extends the line") {
    import spark.implicits._
    val day = 86400000000L
    val daily = (0 until 30).map(t => (t * day, 10.0 + 2.0 * t))
      .toDF("day_us", "y")
    val got = TimeSeries.holtForecast(daily, horizon = 3).collect()
    assert(got.length == 33)
    val fit = got.take(30)
    // on an exactly linear series Holt is exact from t=0
    fit.zipWithIndex.foreach { case (r, t) =>
      assert(r.getDouble(2) == 10.0 + 2.0 * t, s"level at $t") // level = y
      assert(r.getDouble(3) == 2.0, s"trend at $t")
      if (t == 0) assert(r.isNullAt(4))
      else assert(r.getDouble(4) == 10.0 + 2.0 * t, s"yhat at $t")
    }
    val fc = got.drop(30)
    fc.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      assert(r.getLong(0) == (29 + h) * day)
      assert(r.getDouble(4) == 10.0 + 2.0 * (29 + h), s"forecast h=$h")
    }
  }

  test("level shift: trend decays back toward zero after the jump") {
    import spark.implicits._
    val day = 86400000000L
    // flat at 100, jumps to 200 and stays flat
    val daily = (0 until 40).map(t => (t * day, if (t < 20) 100.0 else 200.0))
      .toDF("day_us", "y")
    val got = TimeSeries.holtForecast(daily, horizon = 0).collect()
    val trends = got.map(_.getDouble(3))
    // before the jump the trend is 0 (after the t=1 init settles)
    assert(math.abs(trends(10)) < 1e-9)
    // the jump kicks the trend up, then it decays
    assert(trends(20) > 10.0)
    assert(math.abs(trends(39)) < math.abs(trends(22)) / 4)
  }

  test("fewer than two points fails loudly") {
    import spark.implicits._
    val daily = Seq((0L, 1.0)).toDF("day_us", "y")
    intercept[IllegalArgumentException] {
      TimeSeries.holtForecast(daily)
    }
  }
}
