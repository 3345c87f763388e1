package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TopK

class TopKPerKeySpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // 40 keys × 250 rows, deterministic pseudo-random values, spread over
    // several partitions so the partial/final phases both do real work
    (0 until 10000).map { i =>
      (i % 40L, i.toLong, math.sin(i).abs * 1000)
    }.toDF("k", "id", "v").repartition(8)
  }

  test("matches the row_number window idiom exactly") {
    import spark.implicits._
    val got = TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), k = 3)
      .select("k", "id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 40 * 3)
  }

  test("plans as partial + final TopKPerKeyExec with a key exchange between, no sort") {
    val q = TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // exec nodes print without the Exec suffix; partial and final phases
    // show as ", 3, true" / ", 3, false" trailing args
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains(", 3, true"), plan)  // partial (map-side) phase
    assert(plan.contains(", 3, false"), plan) // final phase after the shuffle
    assert(plan.contains("Exchange hashpartitioning(k#"), plan)
    assert(!plan.contains("Sort "), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val tiny = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 3.0)).toDF("k", "id", "v")
    val got = TopK.perKey(tiny, Seq("k"), Seq(("v", true), ("id", false)), k = 5)
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (1L, 2L), (2L, 3L)))
  }
}
