package graft.ext

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  test("product-limit estimate: hand-computed risk sets with censoring") {
    import spark.implicits._
    // 5 subjects: event@1, censored@2, two events@3, censored@5
    //  t=1: n=5 d=1 → S = 4/5 = 0.8
    //  t=2: n=4 d=0 c=1 → S unchanged (censoring alone never moves S)
    //  t=3: n=3 d=2 → S = 0.8 · (1/3)
    //  t=5: n=1 d=0 c=1 → S unchanged
    val subjects = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (5L, false)).toDF("t", "event")
    val got = Survival.kaplanMeier(subjects)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val s3 = BigDecimal(0.8 * (1.0 - 2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 5L, 1L, 0L, 0.8),
      (2L, 4L, 0L, 1L, 0.8),
      (3L, 3L, 2L, 0L, s3),
      (5L, 1L, 0L, 1L, s3)))
  }

  test("all-censored cohort keeps S at 1; events at t=0 are legal") {
    import spark.implicits._
    val censored = Seq((4L, false), (9L, false)).toDF("t", "event")
    val gotC = Survival.kaplanMeier(censored)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotC === Seq((4L, 2L, 0L, 1L, 1.0), (9L, 1L, 0L, 1L, 1.0)))

    // a same-day reorder is a genuine 0-day duration, not an error
    val zero = Seq((0L, true), (1L, true)).toDF("t", "event")
    val gotZ = Survival.kaplanMeier(zero)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotZ === Seq((0L, 2L, 1L, 0L, 0.5), (1L, 1L, 1L, 0L, 0.0)))
  }
}
