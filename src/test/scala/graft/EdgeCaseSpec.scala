package graft

import org.apache.spark.sql.functions._

/** Degenerate-input guards from the r9 advice: the S4-scalar queries must
  * fail soft (empty result, not an NPE on a null aggregate), and
  * per-(session, sfDir) scratch names must not collide for distinct dirs.
  */
class EdgeCaseSpec extends SparkSpec {

  test("q15_top_supplier returns empty (not NPE) when the quarter has no rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q15_empty").toString
    // every shipment falls OUTSIDE the 1996Q1 window the query filters on
    Seq((1L, "1999-06-01 00:00:00", 100.0, 0.1),
        (2L, "1995-02-01 00:00:00", 200.0, 0.0))
      .toDF("l_suppkey", "ship", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "Supplier#1"), (2L, "Supplier#2"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("q15_top_supplier")(spark, dir)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("s_suppkey", "s_name", "total_rev"))
  }

  test("scratchTag distinguishes dirs whose String.hashCode collide") {
    // "Aa" and "BB" are the canonical 32-bit String.hashCode collision;
    // the old hashCode-keyed scratch dirs mapped both to one path
    assert("Aa".hashCode === "BB".hashCode)
    val s = spark
    assert(SparkEntry.scratchTag(s, "/data/Aa") !=
      SparkEntry.scratchTag(s, "/data/BB"))
    // stable for the same (session, dir)
    assert(SparkEntry.scratchTag(s, "/data/Aa") ===
      SparkEntry.scratchTag(s, "/data/Aa"))
  }
}
