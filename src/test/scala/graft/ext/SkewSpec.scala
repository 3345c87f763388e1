package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted aggregations must be observationally identical to the direct
  * single-shuffle forms.
  */
class SkewSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // one hot key (0) with 5000 rows, many cold keys
    val rows = (0 until 5000).map(i => (0L, i % 7, i.toDouble)) ++
      (0 until 500).map(i => ((i % 50 + 1).toLong, i % 3, i.toDouble))
    rows.toDF("key", "v", "x")
  }

  test("saltedSumCount equals direct groupBy sum/count") {
    import spark.implicits._
    val direct = df.groupBy("key")
      .agg(sum("x").as("sum_value"), count(lit(1)).as("n_rows"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(df, "key", "x", salts = 8)
      .as[(Long, Double, Long)].collect().toSet
    // sums of whole-valued doubles are exact; sets must match
    assert(salted == direct)
  }

  test("saltedCountDistinct equals direct countDistinct") {
    import spark.implicits._
    val direct = df.groupBy("key").agg(countDistinct("v").as("n"))
      .as[(Long, Long)].collect().toSet
    val salted = Skew.saltedCountDistinct(df, "key", "v", salts = 8)
      .as[(Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
