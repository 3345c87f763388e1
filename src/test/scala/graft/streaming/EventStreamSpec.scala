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

  test("watermark drops late events across micro-batches (append mode)") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft-late").toString
    // sink + checkpoint OUTSIDE the watched source dir (the file source
    // lists recursively — a sink inside would be re-read as input)
    val outDir = Files.createTempDirectory("graft-late-out").toString
    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.map { case (id, sec) =>
        (id, sec * 1000000000L, 1L, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    def agg() = spark.readStream.schema(EventStream.eventSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("bucket"), col("n"))
    def run(): Unit = {
      // memory sink cannot recover from a checkpoint; a parquet sink can
      val q = agg().writeStream
        .format("parquet")
        .option("path", s"$outDir/out")
        .outputMode("append")
        .option("checkpointLocation", s"$outDir/ckpt") // shared across runs
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: events at t=1h and t=10h -> watermark checkpointed at 8h
    write("a", Seq((1L, 3600L), (2L, 36000L)))
    run()
    // run 2 (restart from checkpoint): a 9h-late event back at t=1h plus
    // a fresh event at t=20h (advancing the watermark to 18h, which
    // flushes the finalized windows)
    write("b", Seq((3L, 3600L), (4L, 72000L)))
    run()
    // cumulative parquet output across both runs: the t=1h window
    // finalized ONCE with only event 1 — the late event was dropped by
    // the 2h watermark and never re-opened the window
    val out = spark.read.parquet(s"$outDir/out").as[(Long, Long)].collect().toSeq
    assert(out.filter(_._1 == 3600L) == Seq((3600L, 1L)))
  }

  test("aggregate state and source offsets survive checkpoint restarts (exactly-once)") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft-recover").toString
    val outDir = Files.createTempDirectory("graft-recover-out").toString
    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.map { case (id, sec) =>
        (id, sec * 1000000000L, 1L, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    def run(): Unit = {
      val q = spark.readStream.schema(EventStream.eventSchema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("bucket"), col("n"))
        .writeStream.format("parquet")
        .option("path", s"$outDir/out")
        .outputMode("append")
        .option("checkpointLocation", s"$outDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def readOut(): Seq[(Long, Long)] =
      spark.read.parquet(s"$outDir/out").as[(Long, Long)].collect().toSeq

    val h = 3600L
    // run 1: three events inside the 10:00 window — nothing finalized
    // (watermark 10:40-30min stays inside the window), so the partial
    // count of 3 lives ONLY in the checkpointed state store
    write("a", Seq((1L, 10 * h + 300), (2L, 10 * h + 1200), (3L, 10 * h + 2400)))
    run()
    assert(readOut().isEmpty, "window must not finalize before the watermark passes")
    // run 2 (restart): two MORE events in the same window, plus one at
    // 13:00 that advances the watermark past 11:00. The finalized count
    // must merge run-1 state (3) with run-2 arrivals (2): recovery of
    // the partial aggregate, not just the watermark
    write("b", Seq((4L, 10 * h + 3000), (5L, 10 * h + 3300), (6L, 13 * h)))
    run()
    assert(readOut() == Seq((10 * h, 5L)),
      "restart must merge checkpointed partial state with new arrivals, exactly once")
    // run 3 (restart with NO new files): committed source offsets mean
    // nothing is reprocessed and nothing is re-emitted
    run()
    assert(readOut() == Seq((10 * h, 5L)), "empty restart must not duplicate output")
  }

  test("paced waves: late event dropped, on-time event lands (append mode)") {
    import spark.implicits._
    // the stream_late_drop mechanism end-to-end: mtime-ordered wave
    // files + maxFilesPerTrigger=1 make arrival order deterministic;
    // watermark 30 min, 1 h tumbling windows, append mode
    val dir = Files.createTempDirectory("graft-paced").toString
    val base = 1704067200L // 2024-01-01T00:00:00Z
    def wave(name: String, mtimeOffsetMs: Long, rows: (Long, Int, Int)*): Unit =
      EventStream.writeWaveFile(
        rows.map { case (id, hh, mm) =>
          (id, (base + hh * 3600L + mm * 60L) * 1000000000L, 1L, "click", 1.0, "{}")
        }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        s"$dir/$name.parquet", System.currentTimeMillis() - 60000 + mtimeOffsetMs)
    // batch 0: 10:05 and 12:10 → watermark 11:40 after the batch
    wave("a", 0, (1L, 10, 5), (2L, 12, 10))
    // batch 1: buffer wave (12:15). Late records are filtered with the
    // PREVIOUS batch's watermark (SPARK-40925) — a late row must arrive
    // two batches after the advancing wave for the 11:40 mark to apply
    wave("b", 5000, (7L, 12, 15))
    // batch 2: 10:30 is LATE (window end 11:00 <= late-record watermark
    // 11:40 → dropped); 11:50 is on time (window end 12:00 > 11:40)
    wave("c", 10000, (3L, 10, 30), (4L, 11, 50))
    // batch 3: 14:00 advances the watermark to 13:30, which finalizes
    // the 11:00 and 12:00 windows on the following batch
    wave("d", 15000, (5L, 14, 0))
    // batch 4: 16:00 → eviction runs with watermark 13:30; the final
    // no-data batch then evicts through 15:30
    wave("e", 20000, (6L, 16, 0))
    val (result, dropped) = EventStream.withStatePartitions(spark, 4) {
      EventStream.runToCompletionObserved(spark,
        EventStream.tumblingCounts(EventStream.readEventsPaced(spark, dir),
          width = "1 hour", watermark = "30 minutes"),
        "paced_late_sink", org.apache.spark.sql.streaming.OutputMode.Append())
    }
    val rows = result.select("bucket_start", "n_events").as[(Long, Long)].collect().toSeq
    // the OBSERVABLE drop count equals the planted late wave: exactly the
    // one 10:30 event (numRowsDroppedByWatermark summed over the run) —
    // drop semantics alone would pass even if the metric went dark
    assert(dropped === 1L,
      s"numRowsDroppedByWatermark must surface the planted late event, got $dropped")
    // append mode must emit each finalized window EXACTLY once
    assert(rows.map(_._1).distinct.size === rows.size)
    val out = rows.toMap
    // the late event did NOT re-open or inflate the 10:00 window …
    assert(out(base + 10 * 3600L) === 1L, "late 10:30 event must be dropped")
    // … while the on-time event from the SAME late-arriving wave landed
    assert(out(base + 11 * 3600L) === 1L, "on-time 11:50 event must land")
    assert(out(base + 12 * 3600L) === 2L) // 12:10 + the 12:15 buffer
    assert(out(base + 14 * 3600L) === 1L) // final no-data batch eviction
    // windows the final watermark (15:30) never passed stay unemitted
    assert(!out.contains(base + 16 * 3600L))
  }

  test("foreachBatch parquet sink accumulates batches equal to the batch result") {
    import spark.implicits._
    // the production sink shape: foreachBatch gives each micro-batch as a
    // regular DataFrame for arbitrary writers (upserts, multi-sink fanout)
    val dir = Files.createTempDirectory("graft-feb").toString
    val outDir = Files.createTempDirectory("graft-feb-out").toString
    (0 until 300).map { i =>
      (i.toLong, (i * 61000000L) * 1000L, (i % 7).toLong,
        if (i % 3 == 0) "click" else "view", i * 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val stream = EventStream.readEvents(spark, s"$dir/events.parquet", "*.parquet")
      .select("event_id", "user_id", "event_type")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(s"$outDir/rows")
      }
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(s"$outDir/rows")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "event_type")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed == batch && streamed.size == 300)
  }

  test("upsert sink merges across micro-batches and replays are idempotent") {
    import spark.implicits._
    // THREE files + maxFilesPerTrigger=1 → three micro-batches: the
    // merge-with-existing-state branch runs twice (it never runs in the
    // single-file gate query — this spec is its coverage)
    val dir = Files.createTempDirectory("graft-upsert-src").toString
    val stateDir = Files.createTempDirectory("graft-upsert-state").toString
    (0 until 3).foreach { f =>
      (0 until 40).map { i =>
        val id = f * 100 + i
        (id.toLong, (id * 61000000L) * 1000L, (i % 7).toLong,
          if (i % 3 == 0) "click" else "view", i * 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/f$f.parquet")
    }
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$dir/f0.parquet").schema) // raw long-nanos ts
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val got = EventStream.upsertLatestPerUser(spark, stream(), stateDir)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$dir/f0.parquet", s"$dir/f1.parquet", s"$dir/f2.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1).drop("rn")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want && got.size == 7)
    // REPLAY: a fresh run (new checkpoint) over the same files re-merges
    // every batch into the EXISTING state — idempotent, state unchanged
    val replayed = EventStream.upsertLatestPerUser(spark, stream(), stateDir)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(replayed == want)
  }

  test("stream-stream join holds state across micro-batches (views and purchases in separate files)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ssj-src").toString
    // file A: all views; file B: all purchases ≤ 30 min later — with
    // maxFilesPerTrigger=1 the join sides arrive in DIFFERENT batches,
    // so every match requires buffered state from the earlier batch
    def write(name: String, tpe: String, base: Long): Unit =
      (0 until 30).map { i =>
        (base + i, (3600000000L + i * 60000000L + (if (tpe == "purchase") 1800000000L else 0L)) * 1000L,
          (i % 5).toLong, tpe, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("a_views", "view", 0L)
    write("b_purch", "purchase", 1000L)
    def side(tpe: String) = spark.readStream
      .schema(spark.read.parquet(s"$dir/a_views.parquet").schema) // raw long-nanos ts
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .filter(col("event_type") === tpe)
    val streamed = EventStream.runToCompletion(spark,
      EventStream.viewToPurchase(side("view"), side("purchase")),
      "ssj_state_sink", org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = spark.read.parquet(s"$dir/a_views.parquet", s"$dir/b_purch.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val v = batch.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("view_us"))
    val p = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("purchase_us"))
    val want = v.join(p, col("user_id") === col("p_user") &&
        col("purchase_us") >= col("view_us") &&
        col("purchase_us") <= col("view_us") + 3600000000L)
      .select("view_id", "purchase_id", "user_id", "view_us", "purchase_us")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(want.nonEmpty, "fixture must produce matches")
    assert(streamed == want)
  }

  test("approx_count_distinct tracks the exact distinct count within its rsd") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i % 1337).toLong).toDF("v")
    val approx = df.agg(approx_count_distinct("v", rsd = 0.02)).as[Long].head()
    val exact = df.agg(countDistinct("v")).as[Long].head()
    assert(exact == 1337L)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx=$approx exact=$exact") // 3x the requested rsd as the bound
  }
}
