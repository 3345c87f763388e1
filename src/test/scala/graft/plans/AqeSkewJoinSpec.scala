package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Runtime evidence for the 100 TB skew defense (r8 VERDICT #8): AQE's
  * skew-join split must actually FIRE on a planted skewed sort-merge
  * join — until this spec it was asserted only by configuration. The
  * skew decision is made from runtime shuffle map sizes, so the spec
  * executes the join and inspects the ADAPTIVE final plan, with a
  * disabled-skew-join negative control proving the split is attributable
  * to the feature and not to plan shape.
  */
class AqeSkewJoinSpec extends SparkSpec {

  /** One hot key carrying ~9 MB of payload against small cold keys —
    * far beyond the lowered skew threshold, so the hot shuffle
    * partition must split.
    */
  private def plantedJoin(): DataFrame = {
    import spark.implicits._
    val left = ((0 until 100000).map(i => (0L, "x" * 64 + i.toString)) ++
      (0 until 2000).map(i => ((i % 100 + 1).toLong, s"v$i")))
      .toDF("key", "payload")
    val right = (0 to 100).map(k => (k.toLong, k * 2)).toDF("key", "r")
    left.join(right, "key")
  }

  /** The ADAPTIVE final-plan string. Query stages are leaf wrappers
    * (`collect` does not descend into a materialized QueryStageExec),
    * so the spec matches the rendered plan, where SortMergeJoinExec
    * prints `SortMergeJoin(skew=true)` when the split fired.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // the skew decision is runtime — execute first
    val ape = df.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
      .getOrElse(fail("expected an AdaptiveSparkPlan"))
    val plan = ape.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a SortMergeJoin in $plan")
    plan
  }

  private val tuned = Seq(
    // thresholds sized to the fixture (the defaults assume 256 MB
    // production partitions); factor 2 = "split anything 2x the median"
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    // force the sort-merge path: a broadcast join has no skew to split
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[T](extra: (String, String)*)(body: => T): T = {
    val all = tuned ++ extra
    val prev = all.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      all.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the planted skewed sort-merge join at runtime") {
    withConfs() {
      assert(finalPlan(plantedJoin()).contains("skew=true"),
        "skew-join split did not fire on the planted hot key")
    }
  }

  test("negative control: no skew split with skewJoin disabled") {
    withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      assert(!finalPlan(plantedJoin()).contains("skew=true"),
        "skew split reported with the feature disabled")
    }
  }
}
