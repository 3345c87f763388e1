package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvBottomKSpec extends SparkSpec {

  test("bottom-k equals the exact k smallest distinct values, dups ignored") {
    import spark.implicits._
    // values planted with duplicates and out of order
    val vals = Seq(50L, 10L, 30L, 10L, 40L, 20L, 30L, 60L, 5L, 50L)
    val got = vals.toDF("h").agg(KmvBottomK.bottomk(col("h"), 4).as("bk"))
      .head().getSeq[Long](0)
    assert(got == Seq(5L, 10L, 20L, 30L))
  }

  test("under-full group returns the exact distinct set sorted") {
    import spark.implicits._
    val got = Seq(9L, 7L, 9L).toDF("h")
      .agg(KmvBottomK.bottomk(col("h"), 32).as("bk"))
      .head().getSeq[Long](0)
    assert(got == Seq(7L, 9L))
  }

  test("merge across many partitions equals a single-partition run") {
    import spark.implicits._
    val vals = (0 until 5000).map(i => ((i * 2654435761L) % 100000, i % 7))
    val df32 = spark.createDataFrame(
      spark.sparkContext.parallelize(vals, 32)).toDF("h", "g")
    val one = spark.createDataFrame(
      spark.sparkContext.parallelize(vals, 1)).toDF("h", "g")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(KmvBottomK.bottomk(col("h"), 16).as("bk"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(run(df32) == run(one))
  }

  test("bottomk_sketch is callable from SQL") {
    import spark.implicits._
    org.apache.spark.sql.graftshim.ColumnShim.addFunction(spark,
      "bottomk_sketch", KmvBottomK.fromChildren)
    Seq(3L, 1L, 2L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql(
      "SELECT bottomk_sketch(h, 2) AS bk FROM kmv_in")
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 2L))
  }
}
