package graft.ext

import graft.SparkSpec

/** Planted-signal AdaBoost test: a price-bin threshold separates the
  * classes up to 10% noise, so round 1 must find it, and the ensemble
  * training error can never exceed the first stump's.
  */
class BoostingSpec extends SparkSpec {
  import spark.implicits._

  test("adaboost finds the planted threshold and error is non-increasing") {
    // pb <= 7 → mostly +1; pb > 7 → mostly −1 (10% label noise)
    val cells = Seq(
      (2L, 1L, 1L, 90L), (2L, 1L, -1L, 10L),
      (12L, 1L, -1L, 90L), (12L, 1L, 1L, 10L)).toDF("pb", "mb", "y", "n")
    val out = Boosting.adaboostStumps(spark, cells, rounds = 3)
      .collect().sortBy(_.getLong(0))
    assert(out.length === 3)
    val r1 = out.head
    assert(r1.getString(1) === "totalprice")
    assert(r1.getLong(3) === 1L)          // polarity +1: low bins → +1
    assert(r1.getLong(2) >= 2L && r1.getLong(2) < 12L)
    assert(r1.getDouble(4) === 0.1)       // 20 noisy of 200, exact
    // α = ½·ln(0.9/0.1) rounded to 6dp
    assert(math.abs(r1.getDouble(5) - 1.098612) < 1e-9)
    val ens = out.map(_.getDouble(6))
    assert(ens.zip(ens.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(ens.head === 0.1)
  }

  test("adaboost rejects an unbounded joint table and bad rounds") {
    val cells = Seq((0L, 1L, 1L, 5L)).toDF("pb", "mb", "y", "n")
    intercept[IllegalArgumentException] {
      Boosting.adaboostStumps(spark, cells, rounds = 0)
    }
    intercept[IllegalArgumentException] {
      Boosting.adaboostStumps(spark, cells, rounds = 1, maxCells = 0)
    }
  }

  test("gbdt stumps: two-cell fixture recovers the exact split and RMSE curve") {
    // cell A: month 1, two rows of $1.00; cell B: month 12, two rows
    // of $3.00. f0 = 200¢, rmse0 = √(40000/4)/100 = $1. Round 1: every
    // month cut separates A|B identically (gain 40000) and priority
    // never splits (gain −1) → tiebreak picks (month, 1); γ = ∓100¢
    // gives a PERFECT fit, so rmse1 = 0 and round 2 fits zeros.
    val cells = Seq(
      (1L, 1L, 2L, 200L, BigDecimal(20000)),
      (12L, 1L, 2L, 600L, BigDecimal(180000))).toDF("mb", "pr", "n", "sy", "syy")
    val got = Boosting.gbdtStumps(spark, cells).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      (0L, "const", -1L, 4L, 0L, 0.0, 0.0, 1.0),
      (1L, "month", 1L, 2L, 2L, -100.0, 100.0, 0.0),
      (2L, "month", 1L, 2L, 2L, 0.0, 0.0, 0.0)))
  }

  test("gbdt holdout eval: exact train and test RMSE on a hand fixture") {
    // train = the two-cell fixture above (perfect fit after round 1);
    // test = one $1.20 row in month 1 and one $2.80 row in month 12.
    // Leaves predict $1/$3, so test residuals are ±20¢:
    //   rmse0_test = √((92800 − 80000)/2)/100 = 0.8
    //   rmse1_test = √((92800 − 14000 − 78000)/2)/100 = 0.2
    val train = Seq(
      (1L, 1L, 2L, 200L, BigDecimal(20000)),
      (12L, 1L, 2L, 600L, BigDecimal(180000))).toDF("mb", "pr", "n", "sy", "syy")
    val test = Seq(
      (1L, 1L, 1L, 120L, BigDecimal(14400)),
      (12L, 1L, 1L, 280L, BigDecimal(78400))).toDF("mb", "pr", "n", "sy", "syy")
    val got = Boosting.gbdtEval(spark, train, test).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0L, "const", -1L, 1.0, 0.8),
      (1L, "month", 1L, 0.0, 0.2),
      (2L, "month", 1L, 0.0, 0.2)))
  }

  test("gbdt rejects empty and unbounded cell tables") {
    val empty = Seq.empty[(Long, Long, Long, Long, BigDecimal)]
      .toDF("mb", "pr", "n", "sy", "syy")
    intercept[IllegalArgumentException] { Boosting.gbdtStumps(spark, empty) }
    val one = Seq((1L, 1L, 1L, 100L, BigDecimal(10000)))
      .toDF("mb", "pr", "n", "sy", "syy")
    intercept[IllegalArgumentException] {
      Boosting.gbdtStumps(spark, one, maxCells = 0)
    }
  }

  test("gbdt fails loudly when no candidate split exists (single cell)") {
    // one distinct (month, priority) cell: every candidate has an
    // empty side; without the guard γ would be 0/0 = NaN
    val one = Seq((5L, 3L, 4L, 400L, BigDecimal(40000)))
      .toDF("mb", "pr", "n", "sy", "syy")
    val e = intercept[IllegalArgumentException] {
      Boosting.gbdtStumps(spark, one)
    }
    assert(e.getMessage.contains("no candidate split"))
  }

  test("gbdt train RMSE is non-increasing across rounds on random cells") {
    // LS_Boost invariant: each round's γ minimizes the leaf SSE, so
    // train SSE can only fall or stall — on ANY cell table
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val cells = (0 until 20).map { _ =>
        val n = 1L + rnd.nextInt(50)
        val mean = 100L + rnd.nextInt(100000)
        // syy >= sy^2/n (Cauchy-Schwarz) — model n copies of `mean`
        (1L + rnd.nextInt(12), 1L + rnd.nextInt(5), n, n * mean,
          BigDecimal(n) * BigDecimal(mean) * BigDecimal(mean))
      }.toDF("mb", "pr", "n", "sy", "syy")
      val rmse = Boosting.gbdtStumps(spark, cells).collect()
        .map(_.getDouble(7)).toSeq
      rmse.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a + 1e-9, s"rmse rose: $rmse")
        case _ => ()
      }
    }
  }
}
