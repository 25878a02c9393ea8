package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 1L),
    (1L, ts("2024-01-01 11:00:00"), 110.0, 2L),
    (1L, ts("2024-01-01 11:00:00"), 111.0, 3L), // same instant, higher tiebreak wins
    (2L, ts("2024-01-01 09:00:00"), 900.0, 4L)
  ).toDF("key", "qts", "price", "qid")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:30:00"), "t1"), // → quote qid=1
    (1L, ts("2024-01-01 11:00:00"), "t2"), // same instant → qid=3 (tie: greatest)
    (1L, ts("2024-01-01 12:00:00"), "t3"), // → qid=3
    (2L, ts("2024-01-01 08:00:00"), "t4"), // before any quote → dropped (inner)
    (3L, ts("2024-01-01 10:00:00"), "t5")  // key with no quotes → dropped
  ).toDF("key", "tts", "trade_id")

  test("as-of semantics: latest at-or-before, deterministic tie, inner drop") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "tts", "qts", "qid")
      .select("trade_id", "qid", "price").orderBy("trade_id")
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("t1", 1L, 100.0), ("t2", 3L, 111.0), ("t3", 3L, 111.0)))
  }

  test("left variant keeps unmatched trades with null payload") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "tts", "qts", "qid", inner = false)
      .orderBy("trade_id")
    assert(out.count() == 5)
    val unmatched = out.where(col("qid").isNull)
      .select("trade_id").as[String].collect().toSet
    assert(unmatched == Set("t4", "t5"))
  }

  test("tiebreak keeps its native type: bigints above 2^53 do not collide") {
    // 2^53 and 2^53+1 are the same double — a double-cast tiebreak would
    // pick an arbitrary winner; the native long order must pick the greater.
    val big = 9007199254740992L // 2^53
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, big),
      (1L, ts("2024-01-01 10:00:00"), 111.0, big + 1)
    ).toDF("key", "qts", "price", "qid")
    val t = Seq((1L, ts("2024-01-01 11:00:00"), "t1")).toDF("key", "tts", "trade_id")
    val out = AsOfJoin.asOf(t, q, "key", "tts", "qts", "qid")
      .select("qid", "price").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((big + 1, 111.0)))
  }

  test("non-numeric (string) tiebreak stays orderable, not nulled") {
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, "a"),
      (1L, ts("2024-01-01 10:00:00"), 111.0, "b")
    ).toDF("key", "qts", "price", "qid")
    val t = Seq((1L, ts("2024-01-01 11:00:00"), "t1")).toDF("key", "tts", "trade_id")
    val out = AsOfJoin.asOf(t, q, "key", "tts", "qts", "qid")
      .select("qid", "price").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("b", 111.0)))
  }

  test("matches the naive join+row_number formulation on real tables") {
    val ev = Tables.events(spark, SF).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, SF).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val fast = Queries.qAsofJoin(spark, SF)
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val naive = ev.join(ord, Seq("user_id"))
      .where(col("o_orderdate") <= col("ts"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_id", "user_id", "o_orderkey")
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("plans one shuffle of the union, not a per-pair expansion") {
    val p = Queries.qAsofJoin(spark, SF).queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("join"),
      s"as-of must not plan a join (pair expansion):\n$p")
  }

  test("nearest: picks the closer side, backward on exact distance ties") {
    val t = Seq(
      (1L, ts("2024-01-01 10:40:00"), "near_fwd"),  // 40m after qid=1, 20m before qid=2
      (1L, ts("2024-01-01 10:10:00"), "near_back"), // 10m after qid=1, 50m before qid=2
      (1L, ts("2024-01-01 10:30:00"), "tie"),       // 30m both ways → backward qid=1
      (1L, ts("2024-01-01 11:00:00"), "exact"),     // same instant → qid=3, dist 0
      (2L, ts("2024-01-01 08:00:00"), "fwd_only"),  // before the only quote → forward
      (3L, ts("2024-01-01 10:00:00"), "no_match")   // key with no quotes → dropped
    ).toDF("key", "tts", "trade_id")
    val out = AsOfJoin.asOfNearest(t, quotes, "key", "tts", "qts", "qid")
      .select("trade_id", "qid", "dist_us").orderBy("trade_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("exact", 3L, 0L),
      ("fwd_only", 4L, 3600L * 1000000L),
      ("near_back", 1L, 600L * 1000000L),
      ("near_fwd", 2L, 1200L * 1000000L),
      ("tie", 1L, 1800L * 1000000L)))
  }

  test("nearest: same-instant forward ties pick the smallest tiebreak") {
    val q = Seq(
      (1L, ts("2024-01-01 12:00:00"), 100.0, 7L),
      (1L, ts("2024-01-01 12:00:00"), 111.0, 5L)
    ).toDF("key", "qts", "price", "qid")
    val t = Seq((1L, ts("2024-01-01 11:00:00"), "t1")).toDF("key", "tts", "trade_id")
    val out = AsOfJoin.asOfNearest(t, q, "key", "tts", "qts", "qid")
      .select("qid", "price").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((5L, 111.0)))
  }

  test("nearest: left variant keeps unmatched rows with null payload") {
    val t = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"),
      (3L, ts("2024-01-01 10:00:00"), "t5")
    ).toDF("key", "tts", "trade_id")
    val out = AsOfJoin.asOfNearest(t, quotes, "key", "tts", "qts", "qid",
      inner = false)
    assert(out.count() == 2)
    assert(out.where(col("qid").isNull).select("trade_id")
      .as[String].collect().toSeq == Seq("t5"))
  }

  test("nearest: matches the naive pair ranking on real tables, no join planned") {
    val ev = Tables.events(spark, SF).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, SF).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val fast = Queries.qAsofNearest(spark, SF)
    val dist = abs(unix_micros(col("ts")) -
      unix_micros(col("o_orderdate").cast("timestamp")))
    val w = Window.partitionBy(col("event_id")).orderBy(col("dist_us"),
      when(col("o_orderdate") <= col("ts"), 0).otherwise(1),
      when(col("o_orderdate") <= col("ts"), -col("o_orderkey")).otherwise(col("o_orderkey")))
    val naive = ev.join(ord, Seq("user_id"))
      .withColumn("dist_us", dist)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_id", "user_id", "o_orderkey", "dist_us")
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    val p = fast.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("join"),
      s"nearest as-of must not plan a join (pair expansion):\n$p")
  }
}
