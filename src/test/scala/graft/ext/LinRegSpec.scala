package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinRegSpec extends SparkSpec {

  test("exact line: recovers slope/intercept, r2 = 1") {
    import spark.implicits._
    val df = (0 until 100).map { i =>
      val x = i / 100.0
      (x, 0.75 * x + 0.125) // exact binary fractions — no rounding noise
    }.toDF("x", "y")
    val f = LinReg.fit(df, col("x"), col("y"))
    assert(math.abs(f.slope - 0.75) < 1e-6)
    assert(math.abs(f.intercept - 0.125) < 1e-6)
    assert(f.r2 > 0.9999999)
    assert(f.n == 100)
  }

  test("symmetric noise around a line: slope near truth, r2 < 1") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      val x = i / 200.0
      val noise = (if (i % 2 == 0) 1 else -1) * 0.05
      (x, 2.0 * x + noise)
    }.toDF("x", "y")
    val f = LinReg.fit(df, col("x"), col("y"))
    assert(math.abs(f.slope - 2.0) < 0.05)
    assert(f.r2 > 0.9 && f.r2 < 1.0)
  }

  test("kfold on an exact line: every fold recovers it with ~zero test error") {
    import spark.implicits._
    val df = (0 until 300).map { i =>
      val x = i / 300.0
      (x, 0.5 * x + 0.25, (i % 5).toLong)
    }.toDF("x", "y", "fold")
    val folds = LinReg.kfoldCv(df, col("x"), col("y"), col("fold"), k = 5)
    assert(folds.map(_.fold) == Seq(0, 1, 2, 3, 4))
    folds.foreach { f =>
      assert(f.nTest == 60)
      assert(math.abs(f.slope - 0.5) < 1e-3, s"fold ${f.fold}")
      assert(math.abs(f.intercept - 0.25) < 1e-3)
      assert(f.testMse < 1e-6)
    }
  }

  test("kfold flags an overfit-prone fold: outlier fold has the worst test mse") {
    import spark.implicits._
    // fold 0's held-out rows sit off the line the other folds agree on
    val rows = (0 until 250).map { i =>
      val x = i / 250.0
      val fold = (i % 5).toLong
      val y = if (fold == 0) 2.0 * x + 1.0 else 0.5 * x
      (x, y, fold)
    }
    val folds = LinReg.kfoldCv(rows.toDF("x", "y", "fold"),
      col("x"), col("y"), col("fold"), k = 5)
    val worst = folds.maxBy(_.testMse)
    assert(worst.fold == 0)
    assert(worst.testMse > folds.filter(_.fold != 0).map(_.testMse).max * 10)
  }

  test("kfold with an empty fold reports nTest = 0 and mse 0.0, no crash") {
    import spark.implicits._
    // folds 0..3 populated, fold 4 never assigned
    val df = (0 until 200).map { i =>
      val x = i / 200.0
      (x, 0.5 * x, (i % 4).toLong)
    }.toDF("x", "y", "fold")
    val folds = LinReg.kfoldCv(df, col("x"), col("y"), col("fold"), k = 5)
    val f4 = folds.find(_.fold == 4).get
    assert(f4.nTest == 0)
    assert(f4.testMse == 0.0)
    // fold 4's train set is the whole data — the fit is still the line
    assert(math.abs(f4.slope - 0.5) < 1e-3)
  }

  test("empty input fails loudly for fit and kfold") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double, Long)].toDF("x", "y", "fold")
    intercept[IllegalArgumentException] {
      LinReg.kfoldCv(empty, col("x"), col("y"), col("fold"), k = 2)
    }
    intercept[IllegalArgumentException] {
      LogReg.fit(empty.select(col("x"), col("y")), Seq(col("x")), col("y"))
    }
  }

  test("constant x fails loudly") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      LinReg.fit(df, col("x"), col("y"))
    }
  }
}
