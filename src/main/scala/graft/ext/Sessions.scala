package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the driver's `events` table (event_id, ts,
  * user_id, event_type, value, props — FIXTURES.md §A): tumbling windows,
  * sessionization, running aggregates, JSON property extraction. Extension
  * family — the reference has no time/stream operators (SURVEY.md §2.10).
  *
  * Time is handled as integer epoch MICROseconds (`unix_micros`) so window
  * bounds and gaps are exact integers — timezone-free and oracle-exact
  * (sub-second precision survives; no float epoch rounding).
  *
  * Scale design: tumbling aggregation is one hash aggregate on
  * (bucket, type) with map-side partials. Sessionization shuffles once on
  * user_id; within each user partition the gaps-and-islands pass is a sort
  * + two window functions — per-user data must fit a task's sort spill
  * budget, which holds whenever single-user event counts are bounded
  * (salt by (user, day) first if not). The streaming equivalents live in
  * [[graft.streaming.EventStream]].
  */
object Sessions {

  /** Tumbling-window counts/sums: buckets of `widthSec` seconds; the bucket
    * key is the window start in epoch seconds.
    * Output: (bucket_start, event_type, n_events, sum_value).
    */
  def tumbling(events: DataFrame, widthSec: Long = 3600L): DataFrame =
    events
      .withColumn("bucket_start",
        (floor(unix_micros(col("ts")) / lit(widthSec * 1000000L)) * widthSec).cast("long"))
      .groupBy("bucket_start", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Gaps-and-islands sessionization: a new session starts when the gap
    * from the user's previous event exceeds `gapSec`. Output: one row per
    * session — (user_id, session_seq, n_events, t_start, t_end) with epoch
    * microsecond bounds. Deterministic ordering inside a user: (ts, event_id).
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("t_start"),
        max("us").as("t_end"))
  }

  /** Running (cumulative) sum of `value` per user in event-time order.
    * Output: events + (running_value).
    */
  def runningSum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("running_value", sum("value").over(w))
  }

  /** Extract an integer property from the JSON `props` column and aggregate
    * it per event type. Output: (event_type, n_events, sum_k).
    */
  def jsonPropAgg(events: DataFrame, key: String = "k"): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), s"$$.$key").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"))
}
