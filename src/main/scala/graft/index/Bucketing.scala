package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join path from the builder
  * brief ("repartition()/bucketing for co-located joins").
  *
  * Writing two tables bucketed by the same key into the same number of
  * buckets lets Spark join them with NO shuffle exchange on either side:
  * each bucket pairs up by file. At 100 TB this is the difference between
  * re-shuffling the TF table for every doc-side join and reading
  * pre-partitioned data — bucket the big, frequently-joined artifacts
  * (term_frequencies, doc_lengths by doc_id) once at index-build time.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * shuffle exchanges when bucket counts match.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
