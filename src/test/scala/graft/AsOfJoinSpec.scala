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
}
