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

  test("sliding windows: stream AvailableNow == batch overlapping windows") {
    val got = EventStreams.runAvailableNow(
        EventStreams.slidingUserActivity(stream, "2 hours", "1 hour", "10 minutes"),
        "t_sliding")
      .orderBy("window_start", "user_id")
    val want = batchEvents
      .groupBy(window($"ts", "2 hours", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"user_id", $"n")
      .orderBy("window_start", "user_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every event lands in exactly len/slide = 2 windows
    assert(want.agg(sum($"n")).head().getLong(0) == 2 * batchEvents.count())
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

  test("declared q_tumbling_window equals its streaming AvailableNow run") {
    // the SAME 6h tumbling graph the oracle checks in batch, replayed
    // through the streaming engine — closes the batch↔stream parity loop on
    // the declared-query tier
    val got = EventStreams.runAvailableNow(
        EventStreams.tumblingCounts(stream, "6 hours", "10 minutes"), "t_tumbling_q")
      .select(unix_micros($"window_start").as("window_start_us"),
        $"event_type", $"n", $"total_value".as("total"))
    val want = Queries.qTumblingWindow(spark, SF)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("declared q_sessionize agrees with the streaming session_window run") {
    // same 24h-gap sessions per user; the declared query adds a value total,
    // so compare on the shared (user, session_start, n) key
    val got = EventStreams.runAvailableNow(
        EventStreams.sessionCounts(stream, "24 hours", "10 minutes"), "t_sessions_q")
      .select($"user_id", unix_micros($"session_start").as("session_start_us"), $"n")
    val want = Queries.qSessionize(spark, SF)
      .select($"user_id", $"session_start_us", $"n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("declared q_sliding_window totals equal the streaming run rolled up") {
    // the declared query is the global roll-up of the per-user streaming
    // graph over the same 6h/3h windows
    val got = EventStreams.runAvailableNow(
        EventStreams.slidingUserActivity(stream, "6 hours", "3 hours", "10 minutes"),
        "t_sliding_q")
      .groupBy($"window_start").agg(sum($"n").as("n"))
      .select(unix_micros($"window_start").as("window_start_us"), $"n")
    val want = Queries.qSlidingWindow(spark, SF).select($"window_start_us", $"n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
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
    // and the declared oracle-board row states the SAME semantics: the
    // AvailableNow replay must reproduce q_stream_interval_join exactly
    val declared = Queries.qStreamIntervalJoin(spark, SF)
    assert(got.exceptAll(declared).isEmpty && declared.exceptAll(got).isEmpty)
  }

  test("stream-static enrichment join matches the batch join; no stream state") {
    val dim = Tables.customer(spark, SF)
      .select($"c_custkey", $"c_mktsegment")
    val got = EventStreams.runAvailableNow(
      EventStreams.enrichWithDim(stream, dim, "user_id", "c_custkey")
        .select($"event_id", $"user_id", $"c_mktsegment"),
      "t_enrich", OutputMode.Append())
    val want = batchEvents.join(dim, $"user_id" === $"c_custkey")
      .select($"event_id", $"user_id", $"c_mktsegment")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("idempotent foreachBatch parquet sink: exactly-once under replay") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    EventStreams.writeParquetIdempotent(
      stream.select($"event_id", $"user_id", $"value"), out, ckpt)
    val written = spark.read.parquet(s"$out/data")
    assert(written.count() == batchEvents.count())
    // replay every batch by hand with the same batchIds — markers make the
    // second delivery a no-op
    val writer = EventStreams.idempotentParquetBatchWriter(out)
    writer(batchEvents.select($"event_id", $"user_id", $"value"), 0L)
    assert(spark.read.parquet(s"$out/data").count() == batchEvents.count())
  }

  test("watermark drops a too-late row from finalized windows") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_late")
    // FileStreamSource lists plain FILES (it does not recurse into the
    // directory a parquet write produces) — stage each micro-batch by
    // moving the single part file up under a controlled name + mtime.
    var mtime = System.currentTimeMillis()
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet")).findFirst.get
      Files.move(part, dir.resolve(name))
      mtime += 60000 // mtime order = micro-batch order
      Files.setLastModifiedTime(dir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // batch 0: 10:00 and 12:00 → watermark after this batch = 11:50
    stage(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      .toDF("event_id", "ts", "value"), "f0.parquet")
    // batch 1: benign 12:10 row (the data-filter watermark lags one batch —
    // this batch makes 11:50 effective for batch 2)
    stage(Seq((4L, java.sql.Timestamp.valueOf("2024-01-01 12:10:00"), 1.0))
      .toDF("event_id", "ts", "value"), "f1.parquet")
    // batch 2: a LATE row at 10:30, behind the 11:50 watermark — dropped
    stage(Seq((3L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 100.0))
      .toDF("event_id", "ts", "value"), "f2.parquet")
    val schema = spark.read.parquet(dir.resolve("f0.parquet").toString).schema
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val counts = st.withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour")).agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val got = EventStreams.runAvailableNow(counts, "t_late", OutputMode.Append())
      .select($"window.start".cast("string").as("s"), $"n", $"v")
      .as[(String, Long, Double)].collect()
      .map { case (k, n, v) => k -> ((n, v)) }.toMap
    // the finalized 10:00 window contains only event 1 — the late 100.0 row
    // never lands
    assert(got.get("2024-01-01 10:00:00").contains((1L, 1.0)))
  }

  test("flatMapGroupsWithState closed sessions == batch sessions minus each user's open tail") {
    val gapMin = 30
    val got = EventStreams.runAvailableNow(
      EventStreams.closedUserSessions(stream, gapMin).toDF(), "t_closed",
      OutputMode.Append())
    // batch truth: the SAME formulation the oracle board checks as
    // q_closed_sessions — lag/gap sessionization minus each user's LAST
    // session (still open at end-of-stream, the one row the streaming
    // operator deliberately has not emitted yet)
    val want = EventStreams.closedSessionsBatch(batchEvents, gapMin)
    val gotS = got.select($"user_id", $"start_us", $"end_us", $"n_events")
    assert(gotS.exceptAll(want).isEmpty && want.exceptAll(gotS).isEmpty,
      s"closed-session sets differ: streaming=${gotS.count()} batch=${want.count()}")
    // and at least one session actually closed (the parity is not vacuous)
    assert(gotS.count() > 0)
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

  test("closed sessions: cross-batch late event extends the open session's start BACKWARDS") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
    val dir = Files.createTempDirectory("graft_stream_xbatch")
    // two single-file micro-batches (maxFilesPerTrigger=1, oldest mtime first):
    //   batch 1 opens user 1's session at [1000s, 1100s]
    //   batch 2 delivers a LATE 950s event (inside the 30-min gap of the
    //   open session — must merge and pull start back to 950, the advisor
    //   case) and a 10000s event that closes the session by gap
    def stage(name: String, mtimeSec: Long, rows: Seq[(Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_xbatch_w")
      rows.toDF("user_id", "s")
        .select($"user_id", expr("timestamp_seconds(s)").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(name)
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
    }
    stage("b0.parquet", 1000000L, Seq((1L, 1000L), (1L, 1100L)))
    stage("b1.parquet", 1000060L, Seq((1L, 950L), (1L, 10000L)))
    val schema = new StructType()
      .add("user_id", LongType).add("ts", TimestampType)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val got = EventStreams.runAvailableNow(
        EventStreams.closedUserSessions(src, 30).toDF(), "t_xbatch",
        OutputMode.Append())
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // without the symmetric (min on start) merge this emits start=1000s
    assert(got == Seq((1L, 950000000L, 1100000000L, 3L)), got.toString)
  }

  test("transformWithState running top-k: staged replay converges to the batch window") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two single-file micro-batches: split the fixture by event_id parity
      // so most users are touched in BOTH batches (cross-batch state merge)
      val dir = Files.createTempDirectory("graft_stream_topk")
      def stage(name: String, mtimeSec: Long, parity: Int): Unit = {
        val tmp = Files.createTempDirectory("graft_topk_w")
        batchEvents.where($"event_id" % 2 === parity)
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/w")
        val part = Files.list(Paths.get(s"$tmp/w")).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dst = Paths.get(dir.toString, name)
        Files.copy(Paths.get(part), dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
      }
      stage("b0.parquet", 1000000L, 0)
      stage("b1.parquet", 1000060L, 1)
      val src = EventStreams.readEventsStream(
        spark, dir.toString, s"$SF/events.parquet")
        .select($"user_id", $"ts", $"value")
      val batches = StreamingHarness.runAvailableNowBatches(
        EventStreams.runningTopKPerUser(src, 3).toDF())
      assert(batches.length >= 2, s"expected 2 micro-batches, got ${batches.length}")
      // latest emission per user = rows of the LAST batch touching that user
      val latest = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
      batches.sortBy(_._1).foreach { case (_, rows) =>
        rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
          latest(u) = rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      }
      val want = Queries.qRunningTopk(spark, SF)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
      assert(latest.keySet == want.keySet,
        s"user sets differ: ${latest.keySet.size} vs ${want.keySet.size}")
      want.foreach { case (u, rows) =>
        assert(latest(u) == rows, s"user $u: got ${latest(u)} want $rows")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("interval join restart from checkpoint: cross-run pairs survive, no loss or duplication") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}
    // The durability half of the exactly-once story: run 1 consumes batch
    // b0 and STOPS; run 2 is a NEW query instance on the SAME checkpoint +
    // idempotent sink, consuming only b1. The join state buffered from b0
    // must be restored from the state store so b0×b1 pairs still emit, and
    // the offset log must prevent b0's pairs from emitting twice.
    val dir = Files.createTempDirectory("graft_stream_restart")
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    val out = Files.createTempDirectory("graft_restart_out").toString
    def stage(name: String, mtimeSec: Long, rows: Seq[(Long, Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_restart_w")
      rows.toDF("user_id", "event_id", "s")
        .select($"user_id", $"event_id", expr("timestamp_seconds(s)").as("ts"),
          concat(lit("t"), $"event_id").as("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/w")
      val part = Files.list(Paths.get(s"$tmp/w")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dst = Paths.get(dir.toString, name)
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
    }
    val schema = new StructType().add("user_id", LongType)
      .add("event_id", LongType).add("ts", TimestampType)
      .add("event_type", StringType)
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    def run(): Unit = EventStreams.writeParquetIdempotent(
      EventStreams.intervalJoin(src, src, "10 minutes", "30 MINUTES"),
      out, ckpt)
    // b0: events 1@1000s, 2@1200s → in-run pair (1,2). Watermark after b0
    // = 1200s − 600s; nothing evictable, so both stay in join state.
    stage("b0.parquet", 1000000L, Seq((1L, 1L, 1000L), (1L, 2L, 1200L)))
    run() // run 1: graceful stop after draining b0
    // b1: 3@1300s pairs with RESTORED state rows 1 and 2; 4@3000s pairs
    // with 2 (1800s window, inclusive) and 3, but not 1 (2000s > window).
    stage("b1.parquet", 1000060L, Seq((1L, 3L, 1300L), (1L, 4L, 3000L)))
    run() // run 2: NEW query instance, same checkpoint
    val got = spark.read.parquet(s"$out/data")
      .select($"l_event_id", $"r_event_id")
      .as[(Long, Long)].collect().toSeq.sorted
    // the exact 5-pair multiset IS the exactly-once assert: a replayed b0
    // would duplicate (1,2), lost state would drop (1,3)/(2,3)
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"restart must keep b0 join state and not re-emit b0 pairs: $got")
    // offset-log continuity: exactly one DATA batch per run (AvailableNow
    // appends extra EMPTY watermark-advance micro-batches — those dirs
    // carry zero rows and are not replays)
    val dataBatches = spark.read.parquet(s"$out/data")
      .select(input_file_name().as("f"))
      .select(regexp_extract($"f", "batch_id=(\\d+)", 1).as("b"))
      .distinct().count()
    assert(dataBatches == 2, s"one data batch per run, no replays: $dataBatches")
  }

  test("transformWithState top-k restart from checkpoint: RocksDB state resumes") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft_stream_topk_restart")
      val ckpt = Files.createTempDirectory("graft_topk_ckpt").toString
      def stage(name: String, mtimeSec: Long, rows: Seq[(Long, Double)]): Unit = {
        val tmp = Files.createTempDirectory("graft_topkr_w")
        rows.toDF("user_id", "value")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/w")
        val part = Files.list(Paths.get(s"$tmp/w")).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dst = Paths.get(dir.toString, name)
        Files.copy(Paths.get(part), dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
      }
      val schema = new StructType().add("user_id", LongType)
        .add("value", DoubleType)
      def src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      def run() = StreamingHarness.runAvailableNowBatches(
        EventStreams.runningTopKPerUser(src, 2).toDF(), Some(ckpt))
      // run 1: user 1 holds [300, 100] cents, user 2 holds [500]
      stage("b0.parquet", 1000000L, Seq((1L, 1.0), (1L, 3.0), (2L, 5.0)))
      val run1 = run()
      assert(run1.flatMap(_._2).nonEmpty, "run 1 must emit initial top-k")
      // run 2 (new query instance, same checkpoint) sees ONLY b1. User 1's
      // emission [300, 200] is provable state restoration: without the
      // RocksDB state it could only know [200]; user 2 likewise [700, 500].
      stage("b1.parquet", 1000060L, Seq((1L, 2.0), (2L, 7.0)))
      val run2 = run()
      val emitted = run2.flatMap(_._2)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(emitted == Seq((1L, 1L, 300L), (1L, 2L, 200L),
        (2L, 1L, 700L), (2L, 2L, 500L)),
        s"restart must resume per-user top-k state without loss: $emitted")
      // and no duplication: run 2 processed exactly the one new batch
      assert(run2.length == 1, s"run 2 must not replay b0: ${run2.length} batches")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("closed sessions: events far BEFORE the open session close as their own session") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
    val dir = Files.createTempDirectory("graft_stream_early")
    //   batch 1 opens user 1's session at [10000s, 10100s]
    //   batch 2 delivers LATE 100s and 110s events (more than the 30-min gap
    //   BEFORE the open session's start — they must chain with each other and
    //   close as their own session, NOT stretch start back past the gap) plus
    //   a 50000s event that closes the [10000,10100] session by gap
    def stage(name: String, mtimeSec: Long, rows: Seq[(Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_early_w")
      rows.toDF("user_id", "s")
        .select($"user_id", expr("timestamp_seconds(s)").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/w")
      val part = Files.list(Paths.get(s"$tmp/w")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).head
      val dst = Paths.get(dir.toString, name)
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
    }
    stage("b0.parquet", 1000000L, Seq((1L, 10000L), (1L, 10100L)))
    stage("b1.parquet", 1000060L, Seq((1L, 100L), (1L, 110L), (1L, 50000L)))
    val schema = new StructType()
      .add("user_id", LongType).add("ts", TimestampType)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val got = EventStreams.runAvailableNow(
        EventStreams.closedUserSessions(src, 30).toDF(), "t_early",
        OutputMode.Append())
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      (1L, 100000000L, 110000000L, 2L),
      (1L, 10000000000L, 10100000000L, 2L)), got.toString)
  }

  test("input-order determinism: stateful answers invariant to file arrival order within tolerance") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
    // A distributed landing zone delivers files in no particular order
    // (listing order ≠ event-time order at 100 TB); the stateful shapes
    // must give ONE answer for one data set, however the files arrive,
    // as long as lateness stays inside the operator's tolerance
    // (closedUserSessions: the still-open-state merge window, unbounded
    // by design; intervalJoin: its event-time watermark).
    def stageAll(order: Seq[(String, Seq[(Long, Long, Long)])]): String = {
      val dir = Files.createTempDirectory("graft_stream_order")
      order.zipWithIndex.foreach { case ((name, rows), i) =>
        val tmp = Files.createTempDirectory("graft_order_w")
        rows.toDF("user_id", "event_id", "s")
          .select($"user_id", $"event_id", expr("timestamp_seconds(s)").as("ts"),
            concat(lit("t"), $"event_id").as("event_type"))
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/w")
        val part = Files.list(Paths.get(s"$tmp/w")).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        val dst = Paths.get(dir.toString, name)
        Files.copy(Paths.get(part), dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis((1000000L + 60 * i) * 1000))
      }
      dir.toString
    }
    // Four files, each holding COMPLETE sessions (the delivery unit a
    // partitioned writer produces): user 1 sessions A={100,200}s,
    // B={10000,10050}s, C={50000}s (open tail); user 2 D={500}s,
    // E={20000}s (open tail). Gap 30 min.
    val fA = "a.parquet" -> Seq((1L, 1L, 100L), (1L, 2L, 200L))
    val fB = "b.parquet" -> Seq((1L, 3L, 10000L), (1L, 4L, 10050L))
    val fC = "c.parquet" -> Seq((1L, 5L, 50000L), (2L, 6L, 500L))
    val fD = "d.parquet" -> Seq((2L, 7L, 20000L))
    val schema = new StructType().add("user_id", LongType)
      .add("event_id", LongType).add("ts", TimestampType)
      .add("event_type", org.apache.spark.sql.types.StringType)
    def src(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val orders = Seq(
      "fwd"  -> Seq(fA, fB, fC, fD),
      "rev"  -> Seq(fD, fC, fB, fA),
      "shuf" -> Seq(fC, fA, fD, fB))
    // Sessionization: the closed-session set is a pure function of the
    // data — {A, B, D} — whatever order the files land in.
    val sessResults = orders.map { case (tag, order) =>
      val got = EventStreams.runAvailableNow(
          EventStreams.closedUserSessions(src(stageAll(order)), 30).toDF(),
          s"t_ord_sess_$tag", OutputMode.Append())
        .select($"user_id", $"start_us", $"end_us", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      tag -> got
    }
    val wantSess = Seq((1L, 100000000L, 200000000L, 2L),
      (1L, 10000000000L, 10050000000L, 2L), (2L, 500000000L, 500000000L, 1L))
    sessResults.foreach { case (tag, got) =>
      assert(got == wantSess, s"order $tag: $got")
    }
    // Interval join: same files, watermark 2 h > the widest cross-file
    // reordering (50000 s span is irrelevant — the watermark bounds how
    // far event-time may RUN BEHIND the max seen, and every file lands
    // whole). Pair set must match the batch theta join in every order.
    val joinResults = orders.map { case (tag, order) =>
      val got = EventStreams.runAvailableNow(
        EventStreams.intervalJoin(src(stageAll(order)), src(stageAll(order)),
          "14 hours", "30 MINUTES"),
        s"t_ord_join_$tag", OutputMode.Append())
        .select($"l_event_id", $"r_event_id")
        .as[(Long, Long)].collect().toSeq.sorted
      tag -> got
    }
    // batch truth over the same rows
    val all = (fA._2 ++ fB._2 ++ fC._2 ++ fD._2)
      .toDF("user_id", "event_id", "s")
    val l = all.select($"user_id", $"event_id".as("l_event_id"), $"s".as("l_s"))
    val r = all.select($"user_id".as("r_user_id"), $"event_id".as("r_event_id"),
      $"s".as("r_s"))
    val wantJoin = l.join(r, $"user_id" === $"r_user_id" && $"r_s" >= $"l_s" &&
        $"r_s" <= $"l_s" + 1800 && $"l_event_id" =!= $"r_event_id")
      .select($"l_event_id", $"r_event_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(wantJoin.nonEmpty, "join invariance must not be vacuous")
    joinResults.foreach { case (tag, got) =>
      assert(got == wantJoin, s"order $tag: $got want $wantJoin")
    }
    // Beyond tolerance the behavior is the DOCUMENTED drop, not silent
    // skew. The interval join's late bound is per-SIDE: a right-side
    // input drops at the raw watermark (its state evicts there), while a
    // left-side input gets the interval's extra allowance (left state
    // must live `interval` longer to meet future rights, so the
    // too-late filter is wm − interval). One late file shows both:
    // wm after b0 = 1200 − 600 = 600 s; event 3@100 s is late as RIGHT
    // (100 < 600 → pairs (1,3)/(2,3) never emit) but legal as LEFT
    // (100 > 600 − 1800) so (3,1)/(3,2) still join the b0 state.
    val lateDir = stageAll(Seq(
      "b0.parquet" -> Seq((1L, 1L, 1000L), (1L, 2L, 1200L)),
      "b1.parquet" -> Seq((1L, 3L, 100L))))
    val gotLate = EventStreams.runAvailableNow(
      EventStreams.intervalJoin(src(lateDir), src(lateDir),
        "10 minutes", "30 MINUTES"),
      "t_ord_late", OutputMode.Append())
      .select($"l_event_id", $"r_event_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(gotLate == Seq((1L, 2L), (3L, 1L), (3L, 2L)),
      s"late file: right-side pairs drop at wm, left-side keeps the " +
        s"interval allowance: $gotLate")
    // Past even the left allowance (ts < wm − interval on both sides)
    // the file contributes NOTHING — the full documented drop.
    val goneDir = stageAll(Seq(
      "b0.parquet" -> Seq((1L, 1L, 10000L), (1L, 2L, 10200L)),
      "b1.parquet" -> Seq((1L, 3L, 5000L)))) // wm 9600; 5000 < 9600 − 1800
    val gotGone = EventStreams.runAvailableNow(
      EventStreams.intervalJoin(src(goneDir), src(goneDir),
        "10 minutes", "30 MINUTES"),
      "t_ord_gone", OutputMode.Append())
      .select($"l_event_id", $"r_event_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(gotGone == Seq((1L, 2L)),
      s"fully-beyond-watermark file must contribute nothing: $gotGone")
  }

  test("0-event replay: every streaming shape terminates cleanly on an empty source") {
    // The streaming face of gate 2½: a landing zone that received no
    // files yet is a legitimate production state (a just-provisioned
    // feed, a quiet day, a pruned partition), and an AvailableNow run
    // over it must terminate with an empty sink — no watermark NPE, no
    // state-store crash, no hang. FileStreamSource lists the EMPTY
    // directory; the schema still comes from the fixture footer.
    val emptyDir = java.nio.file.Files
      .createTempDirectory("graft_stream_0ev").toString
    def src = EventStreams.readEventsStream(spark, emptyDir, s"$SF/events.parquet")
    val dim = Tables.customer(spark, SF).select($"c_custkey", $"c_mktsegment")
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame, OutputMode)] = Seq(
      ("tumbling", () => EventStreams.tumblingCounts(src, "1 hour", "10 minutes"),
        OutputMode.Complete()),
      ("sliding", () => EventStreams.slidingUserActivity(
        src, "2 hours", "1 hour", "10 minutes"), OutputMode.Complete()),
      ("session", () => EventStreams.sessionCounts(src, "30 minutes", "10 minutes"),
        OutputMode.Complete()),
      ("dedup", () => EventStreams.dedupStream(src, "10 minutes"),
        OutputMode.Append()),
      ("interval_join", () => EventStreams.intervalJoin(
        src, src, "10 minutes", "30 MINUTES"), OutputMode.Append()),
      ("enrich", () => EventStreams.enrichWithDim(src, dim, "user_id", "c_custkey")
        .select($"event_id", $"c_mktsegment"), OutputMode.Append()),
      ("closed_sessions", () => EventStreams.closedUserSessions(src, 30).toDF(),
        OutputMode.Append()),
      ("session_summaries", () => EventStreams.userSessionSummaries(src).toDF(),
        OutputMode.Update()))
    shapes.foreach { case (name, mk, mode) =>
      val got = EventStreams.runAvailableNow(mk(), s"t_0ev_$name", mode)
      assert(got.count() == 0, s"$name must emit nothing on a 0-event source")
    }
    // transformWithState top-k (needs the RocksDB provider): zero batches,
    // zero emissions
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = StreamingHarness.runAvailableNowBatches(
        EventStreams.runningTopKPerUser(
          src.select($"user_id", $"ts", $"value"), 3).toDF())
      assert(batches.flatMap(_._2).isEmpty,
        s"top-k must emit nothing on a 0-event source: $batches")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    // idempotent foreachBatch parquet sink: clean termination, no data dir
    // (zero batches means the writer never ran)
    val out = java.nio.file.Files.createTempDirectory("graft_sink_0ev").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_0ev").toString
    EventStreams.writeParquetIdempotent(
      src.select($"event_id", $"user_id", $"value"), out, ckpt)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/data")) ||
      spark.read.parquet(s"$out/data").count() == 0,
      "0-event sink must stay empty")
  }
}
