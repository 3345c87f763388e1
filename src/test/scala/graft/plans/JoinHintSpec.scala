package graft.plans

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The join-strategy hint must actually change the physical plan — a
  * hint that silently no-ops is worse than none (the operator exists for
  * the broadcast-OOM incident class, where "we hinted it" must mean
  * "it stopped broadcasting").
  */
class JoinHintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def joined(hinted: Boolean) = {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val base = if (hinted) cust.hint("SHUFFLE_MERGE") else cust
    base.join(spark.read.parquet(s"$dir/orders.parquet"),
      col("c_custkey") === col("o_custkey"))
  }

  test("SHUFFLE_MERGE hint flips the broadcast default to sort-merge") {
    // AQE wraps the tree in AdaptiveSparkPlanExec whose children are
    // leaves until execution (the PlanSmellSpec lesson) — assert on the
    // non-adaptive physical plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val default = joined(hinted = false).queryExecution.executedPlan
      val hinted = joined(hinted = true).queryExecution.executedPlan
    // the 150-row customer side broadcasts by default at this scale —
    // the control proves the hint (not the sizes) made the difference
      assert(default.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        "control: planner should broadcast the tiny side unhinted")
      assert(hinted.collect { case s: SortMergeJoinExec => s }.nonEmpty,
        "hint must force a sort-merge join")
      assert(hinted.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        "hinted plan must not broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("the hinted and unhinted results are identical") {
    val a = joined(hinted = true).groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n")).orderBy("c_mktsegment").collect().toSeq
    val b = joined(hinted = false).groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n")).orderBy("c_mktsegment").collect().toSeq
    assert(a == b)
  }
}
