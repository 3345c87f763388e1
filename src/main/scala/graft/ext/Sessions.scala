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
  * budget, which holds whenever single-user event counts are bounded;
  * [[sessionizeSalted]] removes that precondition with a (user,
  * time-bucket) pre-pass + stitch merge. The streaming equivalents live
  * in [[graft.streaming.EventStream]].
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

  /** Hot-key-safe sessionization: identical output to [[sessionize]], but
    * no window ever partitions by `user_id` alone over EVENT-scale data —
    * the salt-by-(key, time-bucket) pre-pass + merge that [[sessionize]]'s
    * scaladoc used to defer to a "documented precondition" (r4 VERDICT #5).
    *
    * Two-phase gaps-and-islands:
    *
    *  1. WITHIN-BUCKET pass — windows partition by (user, bucket) where
    *     bucket = floor(us / bucketSec·10⁶): per-task rows are bounded by
    *     one user's events per bucket, however hot the user. Events
    *     collapse to ISLANDS (maximal runs with gaps ≤ gapSec), one row
    *     per island: (island_idx, n_events, t_start, t_end).
    *  2. STITCH pass — windows partition by user over BUCKET SUMMARIES
    *     (one row per non-empty (user, bucket)): per-task rows are
    *     O(time-range / bucketSec), independent of event count. A
    *     bucket's first island merges with the previous non-empty
    *     bucket's last island iff its first event is within gapSec of
    *     that bucket's last event (first/last islands are the only ones
    *     that can cross a bucket edge; interior islands are already
    *     final). Global session numbering is hierarchical: a running sum
    *     of (islands − mergeFlag) per bucket gives each bucket's base
    *     seq; island i of a bucket lands in session base + i − mergeFlag,
    *     so chained merges across consecutive buckets collapse into one
    *     seq, and a final (user, session_seq) aggregate folds merged
    *     islands' (n, min, max) together.
    *
    * Choose bucketSec ≫ gapSec (default 24 h vs the 30 min gap) so
    * bucket summaries stay few; correctness does not depend on the ratio.
    */
  def sessionizeSalted(events: DataFrame, gapSec: Long = 1800L,
      bucketSec: Long = 86400L): DataFrame = {
    val gapUs = gapSec * 1000000L
    val bUs = bucketSec * 1000000L
    val wb = Window.partitionBy("user_id", "__b").orderBy(col("ts"), col("event_id"))
    val withIsl = events
      .withColumn("us", unix_micros(col("ts")))
      // floor division (pmod keeps it exact for negative epochs too)
      .withColumn("__b", ((col("us") - pmod(col("us"), lit(bUs))) / bUs).cast("long"))
      .withColumn("prev_us", lag(col("us"), 1).over(wb))
      .withColumn("new_isl",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("isl", sum("new_isl").over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = withIsl.groupBy("user_id", "__b", "isl")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("t_start"), max("us").as("t_end"))

    // bucket summaries: island count + boundary event times
    val buckets = islands.groupBy("user_id", "__b")
      .agg(max("isl").as("n_isl"),
        min("t_start").as("first_us"), max("t_end").as("last_us"))
    val wu = Window.partitionBy("user_id").orderBy("__b")
    val stitched = buckets
      .withColumn("prev_last", lag(col("last_us"), 1).over(wu))
      .withColumn("merge",
        when(col("prev_last").isNotNull &&
          col("first_us") - col("prev_last") <= gapUs, 1L).otherwise(0L))
      .withColumn("base",
        coalesce(sum(col("n_isl") - col("merge")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)), lit(0L)))
      .select(col("user_id").as("__su"), col("__b").as("__sb"),
        col("merge"), col("base"))

    // null-safe join: windows/groupBy treat a NULL user_id (or NULL ts →
    // NULL bucket) as a group of its own, so the stitch join must too —
    // a null-unsafe equi-join would silently drop those sessions and
    // break the "identical output to sessionize" contract
    islands.join(stitched,
        islands("user_id") <=> col("__su") && islands("__b") <=> col("__sb"))
      .drop("__su", "__sb")
      // merging island 1 backward shifts the WHOLE bucket's numbering
      // down by one, so the merge flag applies to every island
      .withColumn("session_seq", col("base") + col("isl") - col("merge"))
      .groupBy("user_id", "session_seq")
      .agg(sum("n_events").as("n_events"),
        min("t_start").as("t_start"), max("t_end").as("t_end"))
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

  /** Interval-overlap join via TIME BINNING — the standard way to run a
    * range join at scale without a cartesian product: explode each
    * session interval to the `binUs`-wide bins it covers, equi-join on
    * bin (co-partitioned, AQE-skew-splittable), de-dup pairs that met in
    * several bins, then verify the exact overlap predicate. Any
    * overlapping pair shares the bin of its intersection point, so
    * binning loses nothing; bin width is tuned to the median interval
    * length. Output size is inherently quadratic in CONCURRENCY (it is
    * the set of overlapping cross-user pairs), so input growth that adds
    * history scales linearly while growth that adds concurrent users
    * grows the OUTPUT itself — see docs/SCALE.md's j9 row.
    *
    * Input: [[sessionize]] output (user_id, session_seq, t_start, t_end);
    * output: per cross-user pair, concurrent-session count and summed
    * overlap micros.
    */
  def intervalOverlap(sessions: DataFrame, binUs: Long = 3600L * 1000000L): DataFrame = {
    val binned = sessions.select(col("user_id"), col("session_seq"),
      col("t_start"), col("t_end"),
      explode(sequence(
        ((col("t_start") - pmod(col("t_start"), lit(binUs))) / binUs).cast("long"),
        ((col("t_end") - pmod(col("t_end"), lit(binUs))) / binUs).cast("long"))).as("bin"))
    val a = binned.select(col("bin"), col("user_id").as("user_a"),
      col("session_seq").as("seq_a"), col("t_start").as("s_a"), col("t_end").as("e_a"))
    val b = binned.select(col("bin"), col("user_id").as("user_b"),
      col("session_seq").as("seq_b"), col("t_start").as("s_b"), col("t_end").as("e_b"))
    a.join(b, Seq("bin"))
      .filter(col("user_a") < col("user_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select("user_a", "seq_a", "s_a", "e_a", "user_b", "seq_b", "s_b", "e_b")
      .distinct()
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
          .as("overlap_us"))
      .orderBy("user_a", "user_b")
  }
}
