package graft

import org.apache.spark.sql.types._

/** Fixture-encoding drift guard. The driver regenerates the parquet
  * fixtures between rounds, and their physical encodings have already
  * drifted once (`events.ts`: TIMESTAMP(NANOS) → `timestamp[us],
  * isAdjustedToUTC=false`, which Spark 4 reads as `TIMESTAMP_NTZ`) —
  * silently breaking 6 queries, 12 tests, and the bench before anything
  * cheap failed. This spec pins the schema every loader is REQUIRED to
  * present to the engine, so the next regeneration fails one test with a
  * clear message instead.
  *
  * The pin is on the normalized [[Tables]] output, not the raw footer:
  * the loaders own absorbing encoding drift; consumers own nothing.
  */
class FixturesSpec extends SparkSuite {

  private def fieldTypes(name: String,
                         df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: Tables.events always presents ts as µs TimestampType") {
    val t = fieldTypes("events", Tables.events(spark, SF))
    assert(t("ts") == TimestampType,
      s"Tables.events must normalize every fixture encoding of ts to " +
        s"TimestampType (got ${t("ts")}) — event-time queries " +
        s"(window/session_window/unix_micros) and withWatermark depend on it; " +
        s"add the new encoding's branch in Tables.events")
    assert(t("user_id") == LongType && t("event_type") == StringType
      && t("props") == StringType, s"events columns drifted: $t")
  }

  test("documents/embeddings: text and vector columns keep their types") {
    val d = fieldTypes("documents", Tables.documents(spark, SF))
    assert(d("doc_id") == LongType && d("text") == StringType, s"documents drifted: $d")
    val e = fieldTypes("embeddings", Tables.embeddings(spark, SF))
    assert(e("vec_id") == LongType, s"embeddings drifted: $e")
    assert(e("embedding") == ArrayType(FloatType, true)
      || e("embedding") == ArrayType(FloatType, false),
      s"embedding must stay array<float> (got ${e("embedding")}) — " +
        s"Similarity casts to double explicitly and the int8 quantizer " +
        s"assumes float input")
  }

  test("measure columns stay nonnegative (fixed-point rounding precondition)") {
    // the exact round-half-up integer divisions (Queries.roundDiv) assume
    // nonnegative numerators; the sums they divide come from these columns.
    // If a regeneration introduces negatives, extend roundDiv with the
    // sign-adjusted form (see kmeansStepPrecomputed) before anything else.
    import org.apache.spark.sql.functions.{col, min}
    // Option-read the mins: an all-NULL column or empty table after a bad
    // regeneration must fail with THIS message, not a NullPointerException
    val vMin = Option(Tables.events(spark, SF).agg(min(col("value"))).head.get(0))
    assert(vMin.isDefined, "events.value min is NULL — table empty or column " +
      "all-NULL after regeneration")
    assert(vMin.get.asInstanceOf[Double] >= 0.0,
      s"events.value went negative ($vMin) — roundDiv sites " +
      s"(q_winsorize) need the sign-adjusted division")
    val pMin = Option(Tables.lineitem(spark, SF)
      .agg(min(col("l_extendedprice"))).head.get(0))
    assert(pMin.isDefined, "l_extendedprice min is NULL — table empty or " +
      "column all-NULL after regeneration")
    assert(pMin.get.asInstanceOf[Double] >= 0.0,
      s"l_extendedprice went negative ($pMin) — roundDiv " +
      s"sites (q_agg_pricing, q_trimmed_mean) need the sign-adjusted division")
  }

  test("embeddings stay non-empty (aggregate-identity precondition)") {
    // Spark's aggregate(...) over an empty array returns the 0 identity
    // while DuckDB's list_sum returns NULL — q_norm_outliers' oracle
    // coalesces, but an empty vector would still silently score norm 0 and
    // skew quantizer/ANN paths. A regeneration shipping empty embeddings
    // should fail here with instructions, not drift downstream.
    import org.apache.spark.sql.functions.{col, min, size}
    val dMin = Option(Tables.embeddings(spark, SF)
      .agg(min(size(col("embedding")))).head.get(0))
    assert(dMin.isDefined, "embeddings table is empty after regeneration")
    assert(dMin.get.asInstanceOf[Int] > 0,
      s"an embedding array is empty (min size $dMin) — norm/ANN/quantizer " +
      s"paths assume dim ≥ 1; fix the fixture generator")
  }

  test("TPC-H tables: join keys and measures keep their types") {
    // date columns: every consumer works at to_date/date_trunc granularity,
    // so either timestamp flavor is acceptable — but nothing else is
    // (a raw long here would silently break every date filter)
    def timestampish(t: DataType): Boolean =
      t == TimestampType || t == TimestampNTZType
    val li = fieldTypes("lineitem", Tables.lineitem(spark, SF))
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType,
      s"lineitem keys drifted: $li")
    assert(li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType,
      s"lineitem measures drifted: $li")
    assert(timestampish(li("l_shipdate")),
      s"l_shipdate must stay a timestamp type: $li")
    val o = fieldTypes("orders", Tables.orders(spark, SF))
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType,
      s"orders keys drifted: $o")
    assert(timestampish(o("o_orderdate")),
      s"o_orderdate must stay a timestamp type: $o")
    val c = fieldTypes("customer", Tables.customer(spark, SF))
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType,
      s"customer drifted: $c")
  }
}
