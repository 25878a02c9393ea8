package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an append-only event log: ordered-funnel
  * progression and cohort retention. The reference pipeline lands events
  * into a warehouse precisely so this class of query can be run downstream
  * (SURVEY.md §3.3 — the analytical layer is delegated); these are the two
  * canonical product-analytics shapes over such a table.
  *
  * Scale posture: both operators shuffle the event log exactly once, by the
  * actor key. Funnel state is folded row-locally over each actor's sorted
  * event array (per-actor event counts are bounded in practice; the fold is
  * a single `aggregate` HOF pass, no window over the raw log). Cohort
  * retention reuses the actor-keyed exchange for both the first-touch
  * aggregate and the probe side (ReusedExchange), then reduces to a
  * bounded (cohort × offset) grid.
  */
object EventAnalytics {

  /** Strict ordered-funnel stage timestamps per actor.
    *
    * For stages `(s1, …, sK)`, emits one row per actor with at least one
    * stage-typed event, with `t1..tK` where `t1 = min ts of an s1 event`
    * and `t_i = min ts of an s_i event STRICTLY after t_{i-1}` (null once
    * the chain breaks — an actor that never enters stage 1 keeps an
    * all-null chain, and `count(t_i)` aggregates skip it). Equivalent to
    * the nested `min(ts) WHERE ts > prev` formulation an ANSI oracle can
    * state, but computed in ONE shuffle: events are grouped by actor,
    * sorted row-locally by `(ts, tieCol)`, and the K-slot state is folded
    * left-to-right with an `aggregate` higher-order function — the first
    * qualifying event in sort order IS the minimal qualifying timestamp,
    * because every later-qualifying event sorts after the slot that gated
    * it.
    *
    * At 100 TB the only exchange is the actor hash shuffle; collect_list
    * is partial-aggregated per map task, and state per actor is K
    * timestamps regardless of event volume. */
  def funnelStages(events: DataFrame, actorCol: String, tsCol: String,
                   typeCol: String, tieCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages: need at least one stage")
    val k = stages.length
    val relevant = events.where(col(typeCol).isin(stages.map(x => x: Any): _*))
    val perActor = relevant.groupBy(col(actorCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("ts"), col(tieCol).as("tie"), col(typeCol).as("et")))).as("seq"))
    val init = struct((1 to k).map(i => lit(null).cast("timestamp").as(s"t$i")): _*)
    val folded = aggregate(col("seq"), init, (acc: Column, x: Column) => {
      val fields = (1 to k).map { i =>
        val gate =
          if (i == 1) lit(true)
          else acc(s"t${i - 1}").isNotNull && x("ts") > acc(s"t${i - 1}")
        when(acc(s"t$i").isNull && x("et") === stages(i - 1) && gate, x("ts"))
          .otherwise(acc(s"t$i")).as(s"t$i")
      }
      struct(fields: _*)
    })
    perActor
      .select(col(actorCol), folded.as("st"))
      .select(col(actorCol) +: (1 to k).map(i => col(s"st.t$i").as(s"t$i")): _*)
  }

  /** [[funnelStages]] with a per-step deadline: `t_i` is the minimal
    * s_i-event timestamp with `t_{i-1} < ts ≤ t_{i-1} + maxGapSec` — the
    * time-boxed conversion funnel ("clicked within 7 days of the view"),
    * anchored at the FIRST stage-1 event so the semantics stay a
    * deterministic nested-min an oracle can state. Same single
    * actor-keyed shuffle and K-slot row-local fold as the unbounded
    * form. */
  def funnelStagesWithin(events: DataFrame, actorCol: String, tsCol: String,
                         typeCol: String, tieCol: String, stages: Seq[String],
                         maxGapSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnelStagesWithin: need at least one stage")
    val k = stages.length
    val relevant = events.where(col(typeCol).isin(stages.map(x => x: Any): _*))
    val perActor = relevant.groupBy(col(actorCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("ts"), col(tieCol).as("tie"), col(typeCol).as("et")))).as("seq"))
    val init = struct((1 to k).map(i => lit(null).cast("timestamp").as(s"t$i")): _*)
    val folded = aggregate(col("seq"), init, (acc: Column, x: Column) => {
      val fields = (1 to k).map { i =>
        val gate =
          if (i == 1) lit(true)
          else acc(s"t${i - 1}").isNotNull && x("ts") > acc(s"t${i - 1}") &&
            // exact timestamp+interval comparison (no epoch truncation —
            // sub-second ts parts must compare identically in any engine)
            x("ts") <= acc(s"t${i - 1}") +
              make_dt_interval(lit(0), lit(0), lit(0), lit(maxGapSec.toDouble))
        when(acc(s"t$i").isNull && x("et") === stages(i - 1) && gate, x("ts"))
          .otherwise(acc(s"t$i")).as(s"t$i")
      }
      struct(fields: _*)
    })
    perActor
      .select(col(actorCol), folded.as("st"))
      .select(col(actorCol) +: (1 to k).map(i => col(s"st.t$i").as(s"t$i")): _*)
  }

  /** Cohort retention grid: actors cohorted by their FIRST event date,
    * counted once per `(cohort_week, week_offset)` cell they are active in.
    *
    * `cohort_week` = Monday-truncated week of the actor's first event;
    * `week_offset` = floor(days since first event / 7) of each activity
    * day. Output: (cohort_week, week_offset, n_users), integer-exact.
    *
    * Plan: one scan of the log projected to (actor, day); the first-touch
    * aggregate and the activity side hash-shuffle on the same actor key —
    * the join is co-partitioned and the scan's exchange is reused across
    * both branches. The distinct collapses (actor, cell) duplicates before
    * the final bounded-grid count. */
  def cohortRetention(events: DataFrame, actorCol: String, tsCol: String): DataFrame = {
    val ev = events.select(col(actorCol).as("actor"), to_date(col(tsCol)).as("day"))
    val first = ev.groupBy("actor").agg(min(col("day")).as("cohort_day"))
    ev.join(first, "actor")
      .select(
        col("actor"),
        date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        expr("CAST(floor(datediff(day, cohort_day) / 7) AS BIGINT)").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
