package graft

import org.apache.spark.sql.Row

/** Property the agg_quantile_bins oracle cannot check (both engines
  * mirror the same estimate, so the oracle is blind to estimator
  * QUALITY): the histogram estimate must land within one bin width of
  * the exact order statistic — the covering bin contains the target
  * order statistic by construction (cum_prev < q·N ≤ cum), so any
  * larger error means the cumulative or the interpolation is wrong.
  */
class QuantileEstimateSpec extends SparkSpec {

  test("histogram quantile estimates sit within one bin width of exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_quantile_bins")(spark, dir)
      .collect()
    graft.Caches.clearPersisted()
    val xs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val n = xs.length
    val width = (xs.last - xs.head) / 256.0
    assert(rows.length == 5, "one row per requested quantile")
    rows.foreach { case Row(q: Double, _: Long, _: Long, est: Double) =>
      val target = q * n
      // the ceil(target)-th order statistic (1-indexed) is inside the
      // covering bin, as is the estimate — they differ by < width
      val exact = xs(math.ceil(target).toInt - 1)
      assert(math.abs(est - exact) <= width + 1e-9,
        s"q=$q est=$est exact=$exact width=$width")
    }
  }
}
