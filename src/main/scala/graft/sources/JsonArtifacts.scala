package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.NewHadoopRDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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

  /** Read newline-delimited JSON with a STABLE ingestion-order column
    * `__fetch = struct(file path, byte offset within the file)`.
    *
    * `monotonically_increasing_id()` depends on the partition layout (core
    * count / split size), so a first-wins dedup keyed on it can pick a
    * different winner on a different cluster for identical input files.
    * The Hadoop `TextInputFormat` record key is the line's byte offset
    * within the FILE (not the split), so `(path, offset)` is invariant
    * under any split configuration — the reproducible analog of the
    * reference's fetch order (the landed file encodes API arrival order,
    * sp_airflow/dags/spotify_etl_v2.py:143,161-170). */
  def readLinesNumbered(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val hadoopRdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
    val rows = hadoopRdd.asInstanceOf[NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { case (split, it) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        // .get / .toString copy out of Hadoop's reused Writable instances.
        it.map { case (off, line) => Row(file, off.get, line.toString) }
      }
    val raw = spark.createDataFrame(rows, StructType(Seq(
      StructField("__file", StringType, nullable = false),
      StructField("__offset", LongType, nullable = false),
      StructField("__line", StringType, nullable = false))))
    raw.where(length(trim(col("__line"))) > 0)
      .select(from_json(col("__line"), schema).as("__rec"),
        struct(col("__file"), col("__offset")).as("__fetch"))
      .select(col("__rec.*"), col("__fetch"))
  }

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
