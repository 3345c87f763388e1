package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-phase prefix sum — the carry-propagate scan shape a
  * running total needs on a cluster, factored out of the
  * ts_cusum_changepoint design so every "cumulative X over an ordered
  * domain" face (CUSUM, empirical CDFs, running inventories) shares
  * one audited implementation instead of re-growing an unpartitioned
  * window (banned repo-wide: it funnels all rows through one task —
  * PlanSmellSpec).
  *
  * Phase 1: rows are bucketed by `orderCol / bucketSize` and each
  * bucket computes its LOCAL running sums under a PARTITIONED window
  * (bounded per-task state). Phase 2: per-bucket totals — a table
  * bounded by the value DOMAIN (#buckets), not by N — form a broadcast
  * ledger of strictly-prior-bucket offsets via a bounded triangle
  * self-join, and each row adds its bucket's carry. All arithmetic is
  * exact BIGINT addition, which is association-free — the partitioned
  * construction is provably equal to a sequential scan, which is why a
  * single-node oracle window can mirror it verbatim.
  *
  * Caller contract: `orderCol` is a non-negative LONG, unique per row
  * (pre-aggregate ties first — a prefix "sum at v" is only
  * well-defined on a keyed domain), and `bucketSize` is chosen so
  * #buckets = max(orderCol)/bucketSize stays broadcast-small (the
  * domain is bounded: calendar days, value histograms, epoch hours).
  */
object PrefixSum {

  /** Append `cum_<c>` = running sum of each `valueCols` column (LONG)
    * over ascending `orderCol`, inclusive of the current row.
    */
  def scan(df: DataFrame, orderCol: String, valueCols: Seq[String],
      bucketSize: Long): DataFrame =
    scanBy(df, Seq.empty, orderCol, valueCols, bucketSize)

  /** [[scan]] restarted per group: the running sums reset for each
    * distinct `partCols` tuple (per-key CDFs, per-entity running
    * inventories). The broadcast ledger is bounded by
    * groups × buckets — the caller sizes `bucketSize` accordingly.
    */
  def scanBy(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String], bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    require(valueCols.nonEmpty, "need at least one value column")
    val b = df.withColumn("__bkt",
      (col(orderCol) / lit(bucketSize)).cast("long"))
    val partKeys = partCols :+ "__bkt"
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(b) { (acc, c) =>
      acc.withColumn(s"__loc_$c", sum(col(c)).over(w))
    }
    val totAggs = valueCols.map(c => sum(col(c)).as(s"__tot_$c"))
    val bktAgg = b.groupBy(partKeys.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val prior = bktAgg.select(
      (partCols.map(c => col(c).as(s"__p_$c")) :+
        col("__bkt").as("__p_bkt")) ++
        valueCols.map(c => col(s"__tot_$c")): _*)
    val offAggs = valueCols.map(c =>
      coalesce(sum(s"__tot_$c"), lit(0L)).as(s"__off_$c"))
    val priorCond = partCols
      .map(c => col(s"__p_$c") === col(c))
      .foldLeft(col("__p_bkt") < col("__bkt"))(_ && _)
    val ledger = bktAgg.select(partKeys.map(col): _*)
      .join(broadcast(prior), priorCond, "left")
      .groupBy(partKeys.map(col): _*)
      .agg(offAggs.head, offAggs.tail: _*)
    val outCols: Seq[Column] =
      df.columns.toSeq.map(col) ++
        valueCols.map(c => (col(s"__loc_$c") + col(s"__off_$c")).as(s"cum_$c"))
    local.join(broadcast(ledger), partKeys)
      .select(outCols: _*)
  }
}
