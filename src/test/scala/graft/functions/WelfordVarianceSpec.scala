package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WelfordVarianceSpec extends SparkSpec {

  test("typed Aggregator matches built-in var_samp across partitions") {
    import spark.implicits._
    // deterministic, multi-partition, mixed-magnitude input so the merge
    // path (partition-state combination) actually runs
    val xs = (1 to 5000).map(i => ((i % 7).toLong, math.sin(i) * 1000 + i * 0.001))
    val df = xs.toDF("k", "x").repartition(8)
    val wv = udaf(WelfordVariance) // untyped-DataFrame face of the Aggregator
    val got = df.groupBy("k").agg(wv(col("x")).as("wv"))
    val want = df.groupBy("k").agg(var_samp("x").as("vs"))
    val joined = got.join(want, "k").collect()
    assert(joined.length == 7)
    joined.foreach { r =>
      val (wv, vs) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(wv - vs) <= 1e-9 * math.max(1.0, math.abs(vs)),
        s"k=${r.getLong(0)} welford=$wv var_samp=$vs")
    }
  }

  test("degenerate groups: n<2 yields NaN like var_samp yields null/NaN") {
    import spark.implicits._
    val one = Seq(1.0).toDS()
    val wv = one.select(WelfordVariance.toColumn).collect().head
    assert(wv.isNaN)
  }
}
