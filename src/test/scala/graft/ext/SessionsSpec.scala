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
}
