package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse face a
  * lakehouse pipeline needs next to `dim_upsert`'s type-1 overwrite:
  * type 2 keeps FULL HISTORY as effective-dated rows, so facts can
  * join to the dimension value that was current at fact time (an as-of
  * join — [[AsOfJoin]] — against `eff_from`).
  *
  * Gaps-and-islands construction, all relational: flag attribute
  * changes with `lag`, running-sum the flags into island ids (the
  * row's VERSION number), collapse each island to one row, close each
  * version with the next version's start via `lead`. Three
  * key-partitioned windows + one aggregate — shuffles once on the key,
  * no self-join, no driver loop; at 100 TB the cost is one shuffle of
  * (key, ts, attr) triples, same shape as any sessionization.
  */
object Scd {

  /** Collapse an ordered change log into SCD type-2 rows. Output:
    * (key, version, attr, eff_from, eff_to, n_rows) — `version` is the
    * 1-based change ordinal per key, `eff_to` is NULL for the current
    * version, `n_rows` counts source rows collapsed into the version.
    * Deterministic: (ts, tieBreak) must be unique per key.
    */
  def type2(df: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val prev = lag(col(attr), 1).over(w)
    val flagged = df.withColumn("chg",
      when(prev.isNull || prev =!= col(attr), 1).otherwise(0))
    val islands = flagged.withColumn("version",
      sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val collapsed = islands
      .groupBy(col(key), col("version"), col(attr))
      .agg(min(col(ts)).as("eff_from"), count(lit(1)).as("n_rows"))
    val byVersion = Window.partitionBy(key).orderBy("version")
    collapsed
      .withColumn("eff_to", lead(col("eff_from"), 1).over(byVersion))
      .select(col(key), col("version").cast("long").as("version"), col(attr),
        col("eff_from"), col("eff_to"), col("n_rows"))
  }
}
