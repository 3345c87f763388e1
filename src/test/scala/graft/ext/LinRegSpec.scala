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

  test("constant x fails loudly") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      LinReg.fit(df, col("x"), col("y"))
    }
  }
}
