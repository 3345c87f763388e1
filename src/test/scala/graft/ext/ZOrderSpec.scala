package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("spread16 and morton2 match known bit patterns") {
    import spark.implicits._
    val df = Seq((0xFFFFL, 0L), (3L, 1L), (0L, 0xFFFFL)).toDF("x", "y")
    val got = df.select(
      ZOrder.spread16(col("x")).as("sx"),
      ZOrder.morton2(col("x"), col("y")).as("z"))
      .as[(Long, Long)].collect()
    assert(got(0) == ((0x55555555L, 0x55555555L))) // y=0 contributes nothing
    assert(got(1)._2 == 7L)                        // x=0b11 even bits, y=0b1 odd bit
    assert(got(2)._2 == 0xAAAAAAAAL)               // all-y odd bits
  }

  test("clusterStats buckets bound BOTH dimensions (the data-skipping property)") {
    import spark.implicits._
    // a full 64x64 grid; with bucketBits=4 each bucket pins the top two
    // scaled bits of EACH dim, so every bucket's bbox spans at most 1/4
    // of each range — the multiplicative pruning a 1-D sort cannot give
    val grid = (0 until 4096).map(i => (i % 64L, i / 64L)).toDF("x", "y")
    val stats = ZOrder.clusterStats(grid, "x", "y", bucketBits = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16)
    assert(stats.map(_._2).sum == 4096L)
    stats.foreach { case (_, _, xMin, xMax, yMin, yMax) =>
      assert(xMax - xMin <= 16, s"x span too wide: $xMin..$xMax")
      assert(yMax - yMin <= 16, s"y span too wide: $yMin..$yMax")
    }
  }

  test("degenerate constant column scales to bucket 0") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, 7L)).toDF("x", "y")
    val stats = ZOrder.clusterStats(df, "y", "x", bucketBits = 3)
    assert(stats.select(sum("n")).head().getLong(0) == 10L)
  }
}
