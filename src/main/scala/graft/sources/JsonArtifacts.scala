package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers/writers for the reference pipeline's JSON object artifacts
  * (`/root/reference` lands JSON arrays per GCS object and re-reads them as
  * the inter-task data plane, sp_airflow/dags/spotify_etl_v2.py:69-83,
  * 129-132, 210-215).
  *
  * Always schema-first: `spark.read.schema(...)` — inference is both a
  * second pass over 100 TB and a correctness hazard (a malformed payload
  * should become nulls, matching the reference's `dict.get` semantics, not
  * flip a column's type). */
object JsonArtifacts {

  /** Read a JSON-array artifact (one array of records per file — the
    * reference's object layout) with an enforced schema. */
  def readArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** Read newline-delimited JSON records (the layout `writeLines` emits —
    * splittable, so 1000 executors can share one large artifact). */
  def readLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Idempotent JSON sink: `SaveMode.Ignore` = write only if the target
    * does not already exist — the engine-side analog of the reference's
    * `if_generation_match=0` GCS precondition
    * (scripts/create_artist_batches.py:40). Emits newline-delimited JSON
    * (splittable), not one giant array. */
  def writeLinesIdempotent(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Ignore).json(path)

  /** Overwriting JSON sink for recomputed artifacts. */
  def writeLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
