package graft.ext

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("KS statistic, location, and decision on a hand-computed pair") {
    import spark.implicits._
    // A = {1,2,2,3}, B = {3,4}:
    //   F_A: 1→0.25, 2→0.75, 3→1.0      F_B: 3→0.5, 4→1.0
    //   |ΔF|: v=1: .25, v=2: .75, v=3: .5, v=4: 0 → D = 0.75 at v=2
    val values = (Seq(1L, 2L, 2L, 3L).map((_, true)) ++
      Seq(3L, 4L).map((_, false))).toDF("v", "grp")
    val got = Stats.ksTest(values, bucketSize = 2L)
      .selectExpr("na", "nb", "d_stat", "at_value", "crit_05", "reject_05")
      .as[(Long, Long, Double, Long, Double, Boolean)].collect().toSeq
    assert(got.size === 1)
    val (na, nb, d, at, crit, rej) = got.head
    assert((na, nb) === (4L, 2L))
    assert(d === 0.75)
    assert(at === 2L)
    val wantCrit = BigDecimal(math.sqrt(6.0 / 8.0) * 1.358)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(crit === wantCrit)
    // D = 0.75 < 1.176: tiny samples cannot reject
    assert(!rej)
  }

  test("exact quantiles: hand-computed ranks over a set with duplicates") {
    import spark.implicits._
    // values 10,10,20,30,30,30,40,50 (n=8):
    //   p50 rank ceil(8/2)=4  → smallest v with cum≥4 is 30 (cum: 2,3,6,…)
    //   p25 rank 2 → 10;  p75 rank 6 → 30;  p99 rank ceil(7.92)=8 → 50
    val values = Seq(10L, 10L, 20L, 30L, 30L, 30L, 40L, 50L).toDF("v")
    val got = Stats.exactQuantiles(values,
      Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L), ("p99", 99L, 100L)),
      bucketSize = 16L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("p25", 2L, 10L), ("p50", 4L, 30L),
      ("p75", 6L, 30L), ("p99", 8L, 50L)))
  }

  test("exact quantiles: p100 is the max; a single row answers every p with itself") {
    import spark.implicits._
    val one = Seq(7L).toDF("v")
    val got = Stats.exactQuantiles(one,
      Seq(("a_p01", 1L, 100L), ("b_p100", 1L, 1L)), bucketSize = 4L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a_p01", 1L, 7L), ("b_p100", 1L, 7L)))
  }

  test("grouped exact quantiles: each group gets its own ranks") {
    import spark.implicits._
    // group a = {1,2,3,4} (n=4, p50 rank 2 → 2); group b = {10} (→ 10)
    val values = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++ Seq(("b", 10L)))
      .toDF("g", "v")
    val got = Stats.exactQuantilesBy(values, Seq(("p50", 1L, 2L)),
      bucketSize = 8L)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "p50", 2L, 2L), ("b", "p50", 1L, 10L)))
  }

  test("identical samples give D = 0 located at the smallest value") {
    import spark.implicits._
    val values = (Seq(5L, 6L, 7L).map((_, true)) ++
      Seq(5L, 6L, 7L).map((_, false))).toDF("v", "grp")
    val got = Stats.ksTest(values)
      .selectExpr("d_stat", "at_value", "reject_05")
      .as[(Double, Long, Boolean)].collect().head
    assert(got === ((0.0, 5L, false)))
  }

  test("Mann-Whitney U with ties: hand-computed mid-ranks") {
    import spark.implicits._
    // control = {1,2,3}, treatment = {2,4}; mid-ranks 1, 2.5, 2.5, 4, 5
    //   R₁ = 2.5 + 5 = 7.5 → U₁ = 7.5 − 2·3/2 = 4.5
    //   Var U = 3·2/12 · (6 − (2³−2)/(5·4)) = 0.5 · 5.7 = 2.85
    //   z = 1.5/√2.85 = 0.88852… → 0.8885
    val values = (Seq(1L, 2L, 3L).map((_, 0)) ++ Seq(2L, 4L).map((_, 1)))
      .toDF("v", "arm")
    val got = Stats.mannWhitneyU(values, bucketSize = 2L)
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(got === ((3L, 2L, 4.5, 0.8885, false)))
  }

  test("Mann-Whitney U without ties, and arm-swap antisymmetry") {
    import spark.implicits._
    // control = {1,3,5}, treatment = {2,4,6}: U₁ = 1+2+3 = 6, mean 4.5,
    // Var = 9/12·7 = 5.25, z = 1.5/√5.25 = 0.65465 → 0.6547
    val a = (Seq(1L, 3L, 5L).map((_, 0)) ++ Seq(2L, 4L, 6L).map((_, 1)))
      .toDF("v", "arm")
    val ga = Stats.mannWhitneyU(a, bucketSize = 4L)
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(ga === ((3L, 3L, 6.0, 0.6547, false)))
    // swapping the arm labels reflects U about its mean and negates z
    val b = (Seq(1L, 3L, 5L).map((_, 1)) ++ Seq(2L, 4L, 6L).map((_, 0)))
      .toDF("v", "arm")
    val gb = Stats.mannWhitneyU(b, bucketSize = 4L)
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(gb === ((3L, 3L, 3.0, -0.6547, false)))
  }
}
