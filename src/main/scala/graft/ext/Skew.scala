package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB (builder brief:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE handles skewed *joins* automatically; skewed *aggregations* with a
  * high-cardinality accumulator (e.g. collect_set posting lists for
  * stopword-like terms, count-distinct over a celebrity key) still
  * funnel one key's rows into one task. Salting splits each key into
  * `salts` subkeys for the partial phase, then merges the partials — two
  * shuffles, but each at most 1/`salts` of the hot key's volume per task.
  */
object Skew {

  /** Salted two-phase sum/count aggregate: semantically identical to
    * `df.groupBy(key).agg(sum(valueCol), count)` but the first shuffle
    * distributes each key over `salts` partitions.
    *
    * Output: (key, sum_value, n_rows).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_ps"), count(lit(1)).as("_pc"))
      .groupBy(col(key))
      .agg(sum(col("_ps")).as("sum_value"), sum(col("_pc")).as("n_rows"))

  /** Salted exact count-distinct: partial distinct on (key, salt, value)
    * — the value hash decides the salt so identical values co-locate and
    * dedupe in the partial phase — then a final count per key.
    * Semantically identical to `countDistinct(value)` per key.
    *
    * Output: (key, n_distinct).
    */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .select(col(key), col("_salt"), col(valueCol)).distinct()
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_pd"))
      .groupBy(col(key))
      .agg(sum(col("_pd")).as("n_distinct"))
}
