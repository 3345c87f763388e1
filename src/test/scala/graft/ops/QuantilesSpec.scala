package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Quantiles.exact]] must reproduce Spark's exact `percentile`
  * aggregate (percentile_cont semantics) — it replaces it in the gate
  * (r4 VERDICT #3) with a bounded-memory multi-pass selection, so any
  * value drift would flip the quantile_cont oracles.
  */
class QuantilesSpec extends SparkSpec {

  private def sparkPercentiles(df: org.apache.spark.sql.DataFrame, valueCol: String,
      probs: Seq[Double], groupCols: Seq[String]): Map[Seq[Any], Seq[Double]] = {
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      expr(s"percentile($valueCol, $p)").as(s"q$i")
    }
    val rows =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*).collect()
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*).collect()
    rows.map { r =>
      groupCols.indices.map(r.get).toSeq ->
        probs.indices.map(i => r.getDouble(groupCols.length + i)).toSeq
    }.toMap
  }

  private def assertMatches(df: org.apache.spark.sql.DataFrame, valueCol: String,
      probs: Seq[Double], groupCols: Seq[String] = Nil,
      buckets: Int = 4096, gatherThreshold: Long = 8192): Unit = {
    val got = Quantiles.exact(df, valueCol, probs, groupCols,
      buckets = buckets, gatherThreshold = gatherThreshold)
    val want = sparkPercentiles(df, valueCol, probs, groupCols)
    assert(got.keySet.map(_.toSeq) == want.keySet)
    got.foreach { case (key, gr) =>
      gr.quantiles.zip(want(key)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12,
          s"group $key: got $a want $b")
      }
    }
  }

  private lazy val customer =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("grouped percentiles match Spark's exact percentile (gather path)") {
    assertMatches(customer, "c_acctbal", Seq(0.5, 0.9), Seq("c_mktsegment"))
  }

  test("global quartiles match (histogram levels forced by tiny threshold)") {
    val spend = orders.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("spend"))
    assertMatches(spend, "spend", Seq(0.25, 0.5, 0.75))
    // force ≥2 histogram narrowing levels: 8 buckets, gather at ≤ 5 rows
    assertMatches(spend, "spend", Seq(0.25, 0.5, 0.75),
      buckets = 8, gatherThreshold = 5)
  }

  test("duplicate-heavy values resolve via min==max buckets") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // l_quantity has ~50 distinct values — any bucket quickly degenerates
    assertMatches(li, "l_quantity", Seq(0.1, 0.5, 0.99),
      buckets = 4, gatherThreshold = 2)
  }

  test("edge groups: single row, two rows, all-equal, nulls ignored") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(5.0)), ("b", Some(1.0)), ("b", Some(3.0)),
      ("c", Some(2.0)), ("c", Some(2.0)), ("c", Some(2.0)),
      ("d", Some(7.0)), ("d", None))
      .toDF("g", "v")
    assertMatches(df, "v", Seq(0.0, 0.25, 0.5, 1.0), Seq("g"),
      buckets = 4, gatherThreshold = 1)
    val res = Quantiles.exact(df, "v", Seq(0.5), Seq("g"))
    assert(res(Seq("d")).n == 1L) // null dropped from the count too
  }

  test("NULL group key is a group of its own (null-safe state joins)") {
    import spark.implicits._
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0), (None, 40.0))
      .toDF("g", "v")
    // gather path AND forced histogram path must both see the NULL group
    for (thr <- Seq(8192L, 1L)) {
      val res = Quantiles.exact(df, "v", Seq(0.5), Seq("g"),
        buckets = 4, gatherThreshold = thr)
      assert(res(Seq(null)).n == 4L && res(Seq(null)).quantiles == Seq(25.0),
        s"gatherThreshold=$thr")
      assert(res(Seq("a")).quantiles == Seq(2.0))
    }
  }
}
