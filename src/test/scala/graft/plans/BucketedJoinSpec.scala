package graft.plans

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The `sink_bucketed_join` contract: with both fact tables written
  * bucketed 8-ways on the join key, the sort-merge join itself plans NO
  * shuffle exchange — the storage layout carries the co-location (the
  * "pay the shuffle once at write time" pattern). Only the final
  * per-priority aggregation may exchange.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a join-side exchange") {
    val df = SparkEntry.queries("sink_bucketed_join")(spark, "/root/testdata/sf0.001")
    df.collect() // force execution so AQE finalizes the physical plan
    val executed = org.apache.spark.sql.graftshim.ColumnShim.executedPlan(df)
    val exchanges = executed.collect { case e: ShuffleExchangeExec => e }
    // exactly the aggregation exchange (one shuffle on o_orderpriority);
    // a join-side exchange would make it >= 3
    assert(exchanges.size <= 1,
      s"expected only the aggregation exchange, got ${exchanges.size}:\n$executed")
    // and the result equals the plain (shuffled) join from raw parquet
    val dir = "/root/testdata/sf0.001"
    val expect = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
    assert(df.collect().toSeq == expect.collect().toSeq)
  }
}
