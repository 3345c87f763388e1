package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Sessions

/** Closed sessions emitted by the stateful streaming sessionizer must
  * match the batch gaps-and-islands sessionizer on the same data (the
  * open tail session per user stays in state, so compare the closed set).
  */
class StreamingSessionizerSpec extends SparkSpec {

  test("streaming flatMapGroupsWithState sessions match batch sessionize") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess").toString
    // 3 users, gaps of 40min at every 5th event; ts as long nanos on disk
    val rows = (0 until 120).map { i =>
      val user = (i % 3).toLong
      val step = if ((i / 3) % 5 == 4) 2400L else 300L // 40min vs 5min
      (i.toLong, user, step)
    }
    // cumulative per-user timestamps
    val cum = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val evts = rows.map { case (id, user, step) =>
      val t = cum(user) + step; cum(user) = t
      (id, t * 1000000000L, user, "click", 1.0, "{}")
    }
    evts.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val streamed = StreamingSessionizer.runToCompletion(
      spark,
      StreamingSessionizer.sessionize(
        EventStream.readEvents(spark, s"$dir/events.parquet", "*.parquet"), gapSec = 1800),
      "sess_sink")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val batchAll = Sessions.sessionize(batchEvents, gapSec = 1800)
      .as[(Long, Long, Long, Long, Long)].collect()
    // batch includes each user's final (still-open) session; streaming
    // emits only closed ones — drop each user's max session_seq
    val lastSeq = batchAll.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batchAll.filterNot(r => r._2 == lastSeq(r._1)).toSet

    assert(streamed.nonEmpty)
    assert(streamed == batchClosed)
  }
}
