package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Structured Streaming coverage: event-time windowed aggregation with a
  * watermark over a file source, driven synchronously with
  * Trigger.AvailableNow — the engine's event-stream path (the reference's
  * closest analogue is the wall-clock micro-batch loop, env.go:181-207;
  * watermarks are our extension for out-of-order event time).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed count with watermark over file stream equals batch computation") {
    val src = Files.createTempDirectory("graft_stream").toString
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(src)
      .withColumn("ts", $"ts".cast("timestamp")) // parquet stores NTZ; watermark needs TIMESTAMP
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("win_agg")
      .option("checkpointLocation", Files.createTempDirectory("graft_stream_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("win_agg")
      .select($"window.start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = events
      .withColumn("ts", $"ts".cast("timestamp"))
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    // append mode emits only windows closed by the watermark; everything
    // emitted must match batch, and most windows must have been emitted
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 8, s"${streamed.size} of ${batch.size} windows emitted")
  }

  test("stateful dedup-by-key with flatMapGroupsWithState emits first occurrence only") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src = Files.createTempDirectory("graft_stream2").toString
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    val firstSeen = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, Long](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(user) }
      }

    val q = firstSeen.writeStream.outputMode("append").format("memory")
      .queryName("first_seen")
      .option("checkpointLocation", Files.createTempDirectory("graft_stream2_ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("first_seen").as[Long].collect().sorted.toSeq
    val expected = events.select("user_id").distinct().as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("processing-time timeout closes idle sessions under a ProcessingTime trigger") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    // wall-clock companion to the event-time test below: state carries a
    // 200ms processing-time timeout, the ProcessingTime trigger keeps
    // running (empty, timeout-only) micro-batches after the single input
    // file is consumed, and the idle sessions MUST close without any
    // further data — the part AvailableNow cannot exercise. Wall-clock
    // dependent, so the assertion polls with a generous deadline instead
    // of pinning batch boundaries.
    val src = Files.createTempDirectory("graft_stream4")
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("user_id", "epoch")
      .coalesce(1).write.parquet(src.resolve("f1").toString)

    val sessions = spark.readStream.schema("user_id LONG, epoch LONG")
      .parquet(src.toString + "/f*")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long, Boolean)](GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.get
            state.remove()
            (user, n, true) // closed by wall-clock idleness
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            state.setTimeoutDuration(200) // ms idle before the session closes
            (user, n, false)
          }
      }

    val q = sessions.toDF("user_id", "n", "closed")
      .writeStream.outputMode("update").format("memory")
      .queryName("pt_sessions")
      .option("checkpointLocation", Files.createTempDirectory("graft_stream4_ckpt").toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      def closed() = spark.table("pt_sessions").filter($"closed")
        .select("user_id", "n").as[(Long, Long)].collect().toMap
      val deadline = System.currentTimeMillis() + 60000
      var got = closed()
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        got = closed()
      }
      assert(got.get(1L).contains(2L) && got.get(2L).contains(1L),
        s"both sessions must close by processing-time timeout; got $got")
    } finally q.stop()
  }

  test("session gap via mapGroupsWithState event-time timeout closes idle sessions") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val src = Files.createTempDirectory("graft_stream3")
    // three files -> three micro-batches (maxFilesPerTrigger=1). The
    // watermark advances to the previous batch's max event time, so the
    // far-future "flush" events in files 2 and 3 drive the timeout for the
    // sessions opened in file 1 (event-time timeout = deterministic,
    // unlike processing-time).
    // times start at 100s: the initial watermark is epoch 0, and an event
    // AT the watermark is dropped as late by stateful operators
    Seq((1L, 100L), (1L, 130L), (2L, 110L)).toDF("user_id", "epoch")
      .coalesce(1).write.parquet(src.resolve("f1").toString)
    Seq((99L, 3600L)).toDF("user_id", "epoch")
      .coalesce(1).write.parquet(src.resolve("f2").toString)
    Seq((98L, 7200L)).toDF("user_id", "epoch")
      .coalesce(1).write.parquet(src.resolve("f3").toString)

    val sessions = spark.readStream.schema("user_id LONG, epoch LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString + "/f*")
      .withColumn("ts", timestamp_seconds($"epoch"))
      .withWatermark("ts", "0 seconds")
      // the watermarked column must stay in the Dataset for event-time timeout
      .select($"user_id".as("_1"), $"epoch".as("_2"), $"ts".as("_3"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Boolean)](GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, _) = state.get
            state.remove()
            (user, n, true) // session closed by the 60s idle gap
          } else {
            val ts = rows.map(_._2).toSeq
            val (n0, last0) = state.getOption.getOrElse((0L, 0L))
            val last = math.max(last0, ts.max)
            state.update((n0 + ts.size, last))
            state.setTimeoutTimestamp((last + 60) * 1000) // ms epoch
            (user, n0 + ts.size, false)
          }
      }

    val q = sessions.toDF("user_id", "n", "closed")
      .writeStream.outputMode("update").format("memory")
      .queryName("sessions")
      .option("checkpointLocation", Files.createTempDirectory("graft_stream3_ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val closed = spark.table("sessions").filter($"closed")
      .select("user_id", "n").as[(Long, Long)].collect().toMap
    // sessions 1 (2 events) and 2 (1 event) idle past the 60s gap once the
    // watermark reaches 3600 -> closed by event-time timeout
    assert(closed.get(1L).contains(2L) && closed.get(2L).contains(1L),
      s"sessions 1 (2 events) and 2 (1 event) must close by timeout; got $closed")
    // the last flush user's session cannot close (nothing advances the
    // watermark past its timeout); user 99 may or may not close depending
    // on whether AvailableNow runs a final timeout-only batch
    assert(!closed.contains(98L))
  }
}
