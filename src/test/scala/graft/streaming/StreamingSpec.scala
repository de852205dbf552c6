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
}
