package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Batch-parity assertions: the streaming graphs replayed with
  * Trigger.AvailableNow must agree with the equivalent batch query on the
  * same input — the property the reference's daily batch re-run relies on. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def batchEvents = Tables.events(spark, SF)

  /** FileStreamSource tails a directory — stage the fixture file into one. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$SF/events.parquet"),
      dir.resolve("events_0.parquet"))
    dir.toString
  }

  private def stream = EventStreams.readEventsStream(
    spark, streamDir, s"$SF/events.parquet")

  test("tumbling counts: stream AvailableNow == batch groupBy") {
    val got = EventStreams.runAvailableNow(
        EventStreams.tumblingCounts(stream, "1 hour", "10 minutes"), "t_tumbling")
      .orderBy("window_start", "event_type")
    val want = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"total_value")
      .orderBy("window_start", "event_type")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("session windows: stream counts match batch session_window") {
    val got = EventStreams.runAvailableNow(
        EventStreams.sessionCounts(stream, "30 minutes", "10 minutes"), "t_sessions")
    val want = batchEvents
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"user_id", $"n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("streaming dedup keeps one row per event_id") {
    val got = EventStreams.runAvailableNow(
      EventStreams.dedupStream(stream, "10 minutes"), "t_dedup",
      OutputMode.Append())
    assert(got.count() == got.select("event_id").distinct().count())
    assert(got.count() == batchEvents.select("event_id").distinct().count())
  }

  test("stream-stream interval join matches the batch theta join") {
    val got = EventStreams.runAvailableNow(
      EventStreams.intervalJoin(stream, stream, "10 minutes", "30 MINUTES"),
      "t_interval", OutputMode.Append())
    val e = batchEvents
    val l = e.select($"user_id", $"event_id".as("l_event_id"),
      $"ts".as("l_ts"), $"event_type".as("l_type"))
    val r = e.select($"user_id".as("r_user_id"), $"event_id".as("r_event_id"),
      $"ts".as("r_ts"), $"event_type".as("r_type"))
    val want = l.join(r,
        $"user_id" === $"r_user_id" && $"r_ts" >= $"l_ts" &&
          $"r_ts" <= $"l_ts" + expr("INTERVAL 30 MINUTES") &&
          $"l_event_id" =!= $"r_event_id")
      .select($"user_id", $"l_event_id", $"r_event_id", $"l_type", $"r_type")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mapGroupsWithState session summaries cover every user with exact totals") {
    val got = EventStreams.runAvailableNow(
        EventStreams.userSessionSummaries(stream).toDF(), "t_state",
        OutputMode.Update())
    // last emitted summary per user == batch aggregate per user
    val latest = got.groupBy("user_id").agg(max("n_events").as("n_events"))
    val want = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(latest.exceptAll(want).isEmpty && want.exceptAll(latest).isEmpty)
  }
}
