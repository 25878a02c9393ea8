package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (schemas in /root/repo/FIXTURES.md).
  *
  * All loaders take the scale-factor directory explicitly — queries receive
  * `(SparkSession, sfDir)` and must never hardcode a scale factor. Parquet
  * carries its own schema; we do not re-declare it so that filter/column
  * pushdown metadata stays exactly what the footer says.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")

  /** `events.ts` has drifted across fixture generations; normalize every
    * encoding to µs-precision `TimestampType` so downstream event-time code
    * (`unix_micros`, `window()`, `withWatermark`) sees one stable type:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 reads it as a raw long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    [[graft.Sessions]]) — integer `div` to µs, lossless (fixture is
    *    µs-aligned);
    *  - parquet `timestamp[us], isAdjustedToUTC=false`: Spark 4 reads it as
    *    `TIMESTAMP_NTZ` — cast to `TimestampType`, lossless because the
    *    session zone is UTC ([[graft.Sessions]]) and the DuckDB oracle's
    *    timestamps are likewise naive;
    *  - already `TimestampType`: pass through. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** All entity names, for load-verification style queries. */
  val entityNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
