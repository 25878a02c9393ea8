package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Ops, Shuffles, TextOps}

class EventAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (user, ts, type, event_id)
  private def ev(rows: (Long, String, String, Long)*) =
    rows.map { case (u, t, e, id) => (u, ts(t), e, id) }
      .toDF("user_id", "ts", "event_type", "event_id")

  test("funnelStages: strict ordering — later stages only count after earlier ones") {
    val events = ev(
      // user 1: full chain in order
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 11:00:00", "click", 2L),
      (1L, "2024-01-01 12:00:00", "purchase", 3L),
      // user 2: click BEFORE the first view — chain stops at view
      (2L, "2024-01-01 09:00:00", "click", 4L),
      (2L, "2024-01-01 10:00:00", "view", 5L),
      (2L, "2024-01-01 10:30:00", "purchase", 6L),
      // user 3: click simultaneous with view — strict '>' rejects it
      (3L, "2024-01-01 10:00:00", "view", 7L),
      (3L, "2024-01-01 10:00:00", "click", 8L),
      // user 4: never views
      (4L, "2024-01-01 10:00:00", "purchase", 9L))
    val st = EventAnalytics.funnelStages(events, "user_id", "ts",
        "event_type", "event_id", Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
    assert(st.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byUser = st.map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(byUser(1L) == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))))
    assert(byUser(2L) == ((ts("2024-01-01 10:00:00"), null, null)))
    assert(byUser(3L) == ((ts("2024-01-01 10:00:00"), null, null)))
    // stage-typed events but no stage-1 entry → present with an all-null chain
    assert(byUser(4L) == ((null, null, null)))
  }

  test("funnelStages: t2 is the MINIMAL qualifying click, not just any") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 13:00:00", "click", 2L),
      (1L, "2024-01-01 11:00:00", "click", 3L), // earlier qualifying click
      (1L, "2024-01-01 12:00:00", "purchase", 4L)) // after t2=11:00 → counts
    val r = EventAnalytics.funnelStages(events, "user_id", "ts",
      "event_type", "event_id", Seq("view", "click", "purchase")).head()
    assert(r.get(2) == ts("2024-01-01 11:00:00"))
    assert(r.get(3) == ts("2024-01-01 12:00:00"))
  }

  test("funnelStagesWithin: step deadline gates the chain; boundary is inclusive") {
    val events = ev(
      // user 1: click exactly AT the 1h deadline (inclusive) — qualifies
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 11:00:00", "click", 2L),
      // user 2: click 1s past the deadline — chain stops after view
      (2L, "2024-01-01 10:00:00", "view", 3L),
      (2L, "2024-01-01 11:00:01", "click", 4L),
      // user 3: first click late, but a LATER view cannot re-anchor
      // (anchored at the FIRST view by declared semantics)
      (3L, "2024-01-01 10:00:00", "view", 5L),
      (3L, "2024-01-01 13:00:00", "view", 6L),
      (3L, "2024-01-01 13:30:00", "click", 7L))
    val out = EventAnalytics.funnelStagesWithin(events,
        "user_id", "ts", "event_type", "event_id",
        Seq("view", "click"), 3600L)
      .orderBy("user_id")
      .select("user_id", "t1", "t2")
      .as[(Long, Option[Timestamp], Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (2L, Some(ts("2024-01-01 10:00:00")), None),
      (3L, Some(ts("2024-01-01 10:00:00")), None)))
  }

  test("cohortRetention: first-touch cohort, distinct user per cell") {
    val events = ev(
      // user 1 first seen Mon Jan 1 (cohort week 1/1), active twice in week 0 and once in week 2
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-03 10:00:00", "view", 2L),
      (1L, "2024-01-16 10:00:00", "view", 3L),
      // user 2 first seen Wed Jan 10 (cohort week 1/8), active week 1
      (2L, "2024-01-10 10:00:00", "view", 4L),
      (2L, "2024-01-17 10:00:00", "view", 5L))
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("intervalOverlapSelfJoin: overlap residual, exclusive end, no cartesian") {
    val iv = Seq(
      (10L, 1L, 0L, 10L),   // key 10: [0,10)
      (10L, 2L, 5L, 15L),   //         [5,15)  overlaps 1
      (10L, 3L, 10L, 20L),  //         [10,20) touches 1 only at the excluded end
      (20L, 4L, 0L, 10L))   // other key — never paired with key 10
      .toDF("k0", "id", "s", "e")
    val out = Shuffles.intervalOverlapSelfJoin(iv, "k0", "id", "s", "e")
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"overlap join must stay an equi-join with residual:\n$plan")
  }

  test("weightedSeededTopN: weight scales priority; non-positive weights excluded") {
    val df = Seq((1L, 100L), (2L, 100L), (3L, 1000000000L), (4L, 0L), (5L, -5L))
      .toDF("id", "w")
    val out = Ops.weightedSeededTopN(df, "id", col("w"), 3)
    val ids = out.select("id").as[Long].collect().toSet
    // huge weight → tiny priority: id 3 must be selected; 4 and 5 never.
    assert(ids.contains(3L) && !ids.contains(4L) && !ids.contains(5L))
    assert(out.columns.toSeq == Seq("id", "w", "__h", "__w"))
    // deterministic across runs
    assert(Ops.weightedSeededTopN(df, "id", col("w"), 3)
      .select("id").as[Long].collect().toSet == ids)
  }

  test("dupSpanStats: cross-document shingles counted, unique ones not") {
    val docs = Seq(
      (1L, "a b c d"),      // shingles: "a b c", "b c d"
      (2L, "a b c x"),      // shares "a b c" with doc 1
      (3L, "z z z"),        // single shingle, unique
      (4L, "q r"))          // < 3 tokens → no shingles, absent
      .toDF("doc_id", "text")
    val got = TextOps.dupSpanStats(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 500L),
      (2L, 2L, 1L, 500L),
      (3L, 1L, 0L, 0L)))
  }
}
