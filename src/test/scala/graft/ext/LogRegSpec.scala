package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {

  test("planted separable classes: accuracy reaches 1.0 and loss direction is right") {
    import spark.implicits._
    // two clusters well apart on x1: class 0 around -1, class 1 around +1
    val rows = (0 until 200).map { i =>
      val y = i % 2
      val base = if (y == 1) 1.0 else -1.0
      // deterministic jitter in [-0.25, 0.25]
      val j = ((i * 37) % 100) / 200.0 - 0.25
      (base + j, j / 2.0, y.toDouble)
    }
    val df = rows.toDF("x1", "x2", "y")
    val steps = LogReg.fit(df, Seq(col("x1"), col("x2")), col("y"),
      lr = 4.0, iters = 6)
    assert(steps.size == 6)
    // weights move toward +x1 (the separating direction)
    assert(steps.last.weights.head > steps.head.weights.head)
    assert(steps.last.weights.head > 0.0)
    // separable data: final accuracy perfect, and never decreasing at the end
    assert(steps.last.accuracy == 1.0)
    assert(steps.map(_.accuracy).takeRight(2).distinct.size <= 2)
  }

  test("majority-class data: bias absorbs the prior, weights stay small") {
    import spark.implicits._
    // labels independent of features, 25% positive
    val rows = (0 until 400).map { i =>
      val y = if (i % 4 == 0) 1.0 else 0.0
      (((i * 13) % 100) / 100.0, ((i * 7) % 100) / 100.0, y)
    }
    val df = rows.toDF("x1", "x2", "y")
    val steps = LogReg.fit(df, Seq(col("x1"), col("x2")), col("y"),
      lr = 1.0, iters = 3)
    // bias must head negative (toward the 25% prior); accuracy equals the
    // majority rate once every margin is negative
    assert(steps.last.bias < 0.0)
    assert(steps.last.accuracy >= 0.74)
  }

  test("fastSigmoid is the identity-at-0, symmetric rational link") {
    import spark.implicits._
    val df = Seq(-3.0, -1.0, 0.0, 1.0, 3.0).toDF("t")
    val got = df.select(LogReg.fastSigmoid(col("t")).as("p"))
      .as[Double].collect()
    assert(got(2) == 0.5)
    assert(math.abs(got(0) + got(4) - 1.0) < 1e-15) // p(-t) = 1 - p(t)
    assert(got.sameElements(got.sorted)) // strictly increasing
  }
}
