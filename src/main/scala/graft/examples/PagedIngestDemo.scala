package graft.examples

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.Ops

/** End-to-end demo of the DataSourceV2 ingestion path: the paginated
  * "API" source (partition-planned page ranges) → first-wins dedup →
  * variable-precision release-date parse → date-partitioned parquet load —
  * the reference's extract→transform→load chain as ONE lazy plan.
  * `runMain graft.examples.PagedIngestDemo [workDir]`. */
object PagedIngestDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft_paged").toString
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    // "extract": the remote catalog, planned as parallel page ranges
    val pages = spark.read.format("graft-pages")
      .option("total", 500).option("pageSize", 25).option("pagesPerSplit", 5)
      .load()
    println(s"[demo] partitions=${pages.rdd.getNumPartitions} rows=${pages.count()}")

    // "transform": first-wins dedup on album_id (stable page order), parse
    // the variable-precision release_date with the padded single-pass form
    val albums = Ops.dedupFirstWins(pages, Seq("album_id"),
        Seq(col("page"), col("item_id")))
      .withColumn("release_parsed", Ops.parsePartialDate(col("release_date")))
      .withColumn("release_year", year(col("release_parsed")))

    // "load": date-partitioned parquet (the reference's {run_date}/ layout)
    albums.write.mode("overwrite").partitionBy("release_year")
      .parquet(s"$dir/albums")
    val back = spark.read.parquet(s"$dir/albums")
    println(s"[demo] loaded=${back.count()} years=" +
      back.select("release_year").distinct().count())
    println("[demo] sample: " + back.orderBy("item_id").limit(3).collect().mkString("; "))
    spark.stop()
  }
}
