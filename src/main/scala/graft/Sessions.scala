package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify/Bench/tests: one place for the configs
  * the engine depends on.
  *
  *  - shuffle partitions sized to the local core count (not the 200
  *    default) — on a real cluster this is executor-count driven and AQE
  *    coalesces the rest;
  *  - AQE on: runtime coalescing, broadcast demotion, skew-join splitting;
  *  - UTC session time so timestamp semantics match the DuckDB oracle;
  *  - `nanosAsLong` so the ns-precision `events.ts` parquet column is
  *    readable (converted to TimestampType in [[Tables.events]]).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // experiment hook: SPARK_GRAFT_CONF="key=value;key=value" overrides
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
