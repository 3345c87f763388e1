package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form properties of the rank-2 ALS user half-step. */
class AlsSpec extends SparkSpec {
  import spark.implicits._

  test("single-item user solves proportional to the item factor") {
    // (vvᵀ + λI)⁻¹·rv = r/(‖v‖²+λ)·v — so u ∝ v exactly (up to pins)
    val ratings = Seq((1L, 7L, 5L)).toDF("user_id", "item", "r")
    val u = Als.userHalfStep(ratings).collect().head
    val v2 = ratings.select(Als.itemV2(col("item"))).collect().head.getLong(0)
    val (u1, u2) = (u.getDouble(2), u.getDouble(3))
    assert(u.getLong(1) === 1L)
    assert(u1 > 0.0)
    // u1·v2 ≈ u2·1000 (proportionality), tolerance = the 6dp pin scale
    assert(math.abs(u1 * v2 - u2 * 1000.0) < 0.01)
  }

  test("stronger ridge shrinks the solution toward zero") {
    val ratings = Seq((1L, 7L, 5L), (1L, 9L, 3L), (2L, 4L, 8L))
      .toDF("user_id", "item", "r")
    val loose = Als.userHalfStep(ratings, ridgeScaled = 100000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tight = Als.userHalfStep(ratings, ridgeScaled = 10000000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(loose.keySet === Set(1L, 2L))
    loose.foreach { case (userId, u1) =>
      assert(math.abs(tight(userId)) < math.abs(u1))
    }
  }
}
