package graft.ext

import java.sql.Timestamp
import graft.SparkSpec

class SessionsSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private lazy val events = {
    import spark.implicits._
    // user 7: events at t=0, 10min, 20min | gap 2h | 2h20min, 2h25min
    // user 8: single event
    Seq(
      (1L, ts(0), 7L, "click", 1.0, """{"k": 1}"""),
      (2L, ts(600), 7L, "view", 2.0, """{"k": 2}"""),
      (3L, ts(1200), 7L, "click", 3.0, """{"k": 3}"""),
      (4L, ts(8400), 7L, "click", 4.0, """{"k": 4}"""),
      (5L, ts(8700), 7L, "purchase", 5.0, """{"k": 5}"""),
      (6L, ts(100), 8L, "view", 6.0, """{"k": 6}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("sessionize splits on gaps > 30min") {
    import spark.implicits._
    val s = Sessions.sessionize(events, gapSec = 1800)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(s((7L, 1L)) == ((3L, 0L, 1200L * 1000000)))
    assert(s((7L, 2L)) == ((2L, 8400L * 1000000, 8700L * 1000000)))
    assert(s((8L, 1L)) == ((1L, 100L * 1000000, 100L * 1000000)))
  }

  test("tumbling hour buckets") {
    import spark.implicits._
    val t = Sessions.tumbling(events, widthSec = 3600)
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(t((0L, "click")) == ((2L, 4.0))) // events 1,3
    assert(t((0L, "view")) == ((2L, 8.0))) // events 2,6
    assert(t((7200L, "click")) == ((1L, 4.0)))
    assert(t((7200L, "purchase")) == ((1L, 5.0)))
  }

  test("running sum per user in time order") {
    import spark.implicits._
    val r = Sessions.runningSum(events)
      .select("event_id", "running_value")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 1.0 && r(2L) == 3.0 && r(3L) == 6.0 && r(4L) == 10.0)
    assert(r(6L) == 6.0)
  }

  test("json property aggregation") {
    import spark.implicits._
    val j = Sessions.jsonPropAgg(events)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(j("click") == ((3L, 8L)))
    assert(j("view") == ((2L, 8L)))
    assert(j("purchase") == ((1L, 5L)))
  }

  private def sessionSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] = {
    import df.sparkSession.implicits._
    df.select("user_id", "session_seq", "n_events", "t_start", "t_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("salted sessionize equals the plain one on the real events table") {
    val ev = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.streaming.EventStream.microsTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    }
    // bucket (1h) deliberately comparable to the gap (30min) so sessions
    // REGULARLY straddle bucket edges and the stitch path is exercised
    assert(sessionSet(Sessions.sessionizeSalted(ev, 1800, bucketSec = 3600)) ==
      sessionSet(Sessions.sessionize(ev, 1800)))
    // and a day-bucket (the default recommendation)
    assert(sessionSet(Sessions.sessionizeSalted(ev, 1800)) ==
      sessionSet(Sessions.sessionize(ev, 1800)))
  }

  test("salted sessionize: planted hot key, chained cross-bucket merges, empty buckets") {
    import spark.implicits._
    // one user with 20k events every 10 min (gap 30 min → ONE session
    // spanning ~139 daily buckets; every bucket edge is a chained merge),
    // plus planted multi-hour holes that split sessions mid- and
    // at-bucket-edge, plus a quiet user in a far bucket
    val stride = 600L
    val hot = (0 until 20000).map { i =>
      val base = i.toLong * stride +
        (if (i >= 15000) 50000L else 0L) + // hole > gap inside a bucket
        (if (i >= 18000) 200000L else 0L)  // hole spanning empty buckets
      (i.toLong, ts(base), 1L, "click", 1.0, "{}")
    }
    val quiet = Seq((90000L, ts(30000000L), 2L, "view", 1.0, "{}"))
    val ev = (hot ++ quiet)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
    val plain = sessionSet(Sessions.sessionize(ev, 1800))
    for (bucketSec <- Seq(3600L, 86400L)) {
      assert(sessionSet(Sessions.sessionizeSalted(ev, 1800, bucketSec)) == plain,
        s"bucketSec=$bucketSec")
    }
    assert(plain.map(_._1) == Set(1L, 2L) && plain.count(_._1 == 1L) == 3)
  }

  test("salted sessionize keeps NULL-user events (null-safe stitch join)") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), Some(7L), "click", 1.0, "{}"),
      (2L, ts(600), Some(7L), "view", 1.0, "{}"),
      (3L, ts(100), None, "view", 1.0, "{}"),
      (4L, ts(90000), None, "click", 1.0, "{}"), // next day → stitch row
      (5L, ts(90300), None, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def sessions(df: org.apache.spark.sql.DataFrame) = {
      import spark.implicits._
      df.select("user_id", "session_seq", "n_events", "t_start", "t_end")
        .as[(Option[Long], Long, Long, Long, Long)].collect().toSet
    }
    val plain = sessions(Sessions.sessionize(ev, 1800))
    assert(sessions(Sessions.sessionizeSalted(ev, 1800)) == plain)
    assert(plain.count(_._1.isEmpty) == 2) // the NULL user's two sessions survive
  }

  test("salted sessionize plan: event-scale windows are (user, bucket)-partitioned") {
    import spark.implicits._
    val ev = Seq((1L, ts(0), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val plan = org.apache.spark.sql.graftshim.ColumnShim
      .logicalPlan(Sessions.sessionizeSalted(ev, 1800))
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the two event-scale windows (lag + island running sum) carry the
    // bucket salt; the two user-only windows run over bucket SUMMARIES
    // (post-aggregate) — assert both shapes are present and no user-only
    // window sits directly over raw events (no Aggregate below it)
    assert(windows.count(_.partitionSpec.length == 2) >= 1)
    val userOnly = windows.filter(_.partitionSpec.length == 1)
    assert(userOnly.nonEmpty)
    userOnly.foreach { w =>
      assert(w.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, "user-only window must sit above the island/bucket aggregate")
    }
  }
}
