package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Ops

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("binnedRangeJoin equals the naive theta join") {
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 01:30:00")),
      (3L, ts("2024-01-01 05:00:00")),
      (4L, ts("2024-01-02 00:00:00"))).toDF("pid", "pts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")), // spans 3 bins @1h
      (20L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:59:00")),
      (30L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))  // matches nothing
    ).toDF("iid", "start_ts", "end_ts")

    val binned = Ops.binnedRangeJoin(points, intervals, "pts", "start_ts", "end_ts", 3600L)
      .select("pid", "iid")
    val naive = points.join(intervals,
        col("pts") >= col("start_ts") && col("pts") <= col("end_ts"))
      .select("pid", "iid")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("binnedRangeJoin emits no duplicate pairs for multi-bin intervals") {
    def ts(s: String) = Timestamp.valueOf(s)
    // interval spans 25 bins; the point matches exactly once
    val points = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("pid", "pts")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val out = Ops.binnedRangeJoin(points, intervals, "pts", "start_ts", "end_ts", 3600L)
    assert(out.count() == 1)
  }

  test("binnedRangeJoin plans an equi-join, not a nested loop") {
    val points = Tables.events(spark, SF).select(col("event_id"), col("ts"))
    val intervals = Tables.events(spark, SF)
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
    val p = Ops.binnedRangeJoin(points, intervals, "ts", "start_ts", "end_ts", 3600L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned range join must stay hash-partitioned:\n$p")
  }

  test("cosine_sim is available in SQL by default via GraftExtensions") {
    assert(spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), " +
        "array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS s")
      .collect()(0).getDouble(0) == 1.0)
    // decimal literals are rejected with a typed, named error (no silent cast)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0))").collect()
    }
    assert(err.getMessage.contains("cosine_sim expects array<float|double>"))
  }
}
