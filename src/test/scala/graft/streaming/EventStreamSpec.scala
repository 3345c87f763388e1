package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Sessions

/** Batch/stream parity: a completed AvailableNow run over a static file
  * source must produce the same tumbling aggregate as the batch operator.
  */
class EventStreamSpec extends SparkSpec {

  test("streaming tumbling counts equal batch tumbling over the same files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    // ts written as long nanos — the driver's on-disk shape
    val rows = (0 until 200).map { i =>
      (i.toLong, (i * 137000000L) * 1000L + 123L, (i % 5).toLong,
        if (i % 2 == 0) "click" else "view", i * 0.5, s"""{"k": $i}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val streamed = EventStream.runToCompletion(
      spark,
      EventStream.tumblingCounts(EventStream.readEvents(spark, s"$dir/events.parquet", "*.parquet")),
      "parity_sink")
      .select("bucket_start", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))

    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val batch = Sessions.tumbling(batchEvents, widthSec = 3600)
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
