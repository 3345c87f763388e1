package graft.index

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import graft.SparkSpec

/** The co-located join over same-bucketed tables must plan with ZERO
  * shuffle exchanges — the 100 TB join story (docs/SCALE.md).
  */
class BucketingSpec extends SparkSpec {

  /** Count shuffle exchanges in the FINAL adaptive plan: AQE hides its
    * physical plan from `collect`, so run the query first and inspect the
    * final plan's rendering.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes
    "Exchange (hashpartitioning|SinglePartition)".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
  }

  test("join of two same-bucketed tables plans without a shuffle") {
    import spark.implicits._
    // force sort-merge joins so the comparison is shuffle-vs-bucket, not
    // broadcast (tiny test tables would otherwise broadcast both ways)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val corpus = (1L to 200L).map(i => (i, s"merge sort table scan row $i"))
      .toDF("doc_id", "text")
    val flat = Indexer.flatWords(corpus, stem = false)
    Bucketing.writeBucketed(Indexer.termFrequencies(flat), "tf_bkt", "doc_id", 4)
    Bucketing.writeBucketed(Indexer.docLengths(flat), "dl_bkt", "doc_id", 4)
    try {
      val joined = Bucketing.coLocatedJoin(spark, "tf_bkt", "dl_bkt", "doc_id")
      assert(joined.count() > 0)
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)

      // control: the same join over NON-bucketed inputs does shuffle
      val plain = Indexer.termFrequencies(flat)
        .join(Indexer.docLengths(flat), "doc_id")
      assert(shuffles(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS tf_bkt")
      spark.sql("DROP TABLE IF EXISTS dl_bkt")
    }
  }
}
