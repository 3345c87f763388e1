package graft.ext

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  test("two-phase scan equals a sequential prefix sum across bucket boundaries") {
    import spark.implicits._
    // keys straddle several size-5 buckets, with holes, starting at 0
    val keys = Seq(0L, 1L, 4L, 5L, 7L, 12L, 14L, 15L, 23L)
    val rows = keys.zipWithIndex.map { case (k, i) =>
      (k, (i + 1).toLong, (10 - i).toLong)
    }
    val got = PrefixSum.scan(rows.toDF("k", "a", "b"), "k", Seq("a", "b"),
      bucketSize = 5L)
      .orderBy("k")
      .selectExpr("k", "cum_a", "cum_b")
      .as[(Long, Long, Long)].collect().toSeq
    var (ca, cb) = (0L, 0L)
    val want = rows.sortBy(_._1).map { case (k, a, b) =>
      ca += a; cb += b; (k, ca, cb)
    }
    assert(got === want)
  }

  test("scanBy restarts the running sum at every group boundary") {
    import spark.implicits._
    val rows = Seq(
      ("a", 0L, 1L), ("a", 3L, 2L), ("a", 7L, 3L), // buckets 0,0,1
      ("b", 3L, 10L), ("b", 8L, 20L))              // buckets 0,2
    val got = PrefixSum.scanBy(rows.toDF("g", "k", "a"), Seq("g"), "k",
      Seq("a"), bucketSize = 4L)
      .orderBy("g", "k").selectExpr("g", "k", "cum_a")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, 1L), ("a", 3L, 3L), ("a", 7L, 6L),
      // group b must NOT see group a's carry, even in shared buckets
      ("b", 3L, 10L), ("b", 8L, 30L)))
  }

  test("single bucket and negative values still scan correctly") {
    import spark.implicits._
    val rows = Seq((1L, 5L), (2L, -3L), (3L, 4L))
    val got = PrefixSum.scan(rows.toDF("k", "a"), "k", Seq("a"),
      bucketSize = 100L)
      .orderBy("k").selectExpr("k", "cum_a")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L), (2L, 2L), (3L, 6L)))
  }
}
