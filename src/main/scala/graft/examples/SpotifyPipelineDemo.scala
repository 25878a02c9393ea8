package graft.examples

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.domain.{Schemas, SpotifyPipeline}

/** End-to-end demo of the domain pipeline through the public API:
  * name intake → batching → raw payload parse → entity projection →
  * partitioned parquet load → read-back. `runMain graft.examples.SpotifyPipelineDemo [workDir]`. */
object SpotifyPipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft_demo").toString
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/artist_names.txt"),
      "  Bad Bunny \n\nTyler,  The Creator\nROSÉ\n")
    val names = SpotifyPipeline.parseArtistNames(spark.read.text(s"$dir/artist_names.txt"))
    println("[demo] names: " + names.collect().map(_.getString(0)).mkString(" | "))
    println("[demo] batches: " + SpotifyPipeline.nameBatches(names, 2)
      .orderBy("batch_id").collect().mkString("; "))
    println("[demo] query: " + names
      .select(SpotifyPipeline.searchQuery(col("artist_name"))).first().getString(0))

    val rawAlbums = spark.read.schema(Schemas.rawAlbum).json(
      spark.createDataset(List(
        """{"id":"al1","name":"First","release_date":"2019-07","album_type":"album","total_tracks":3,"artists":[{"id":"a1","name":"AA"}]}""",
        """{"id":"al1","name":"DupLater","release_date":"2020","album_type":"single","total_tracks":1,"artists":[{"id":"a1","name":"AA"}]}""",
        """{"id":"al2","name":"Second","release_date":"2021-02-03","album_type":"album","total_tracks":9,"artists":[{"id":"a2","name":"BB"},{"id":"a1","name":"AA"}]}"""
      ))(Encoders.STRING)).withColumn("fetch_order", monotonically_increasing_id())

    val albums = SpotifyPipeline.projectAlbums(rawAlbums, col("fetch_order"))
      .withColumn("release_date_parsed", SpotifyPipeline.parseReleaseDate(col("release_date")))
    println("[demo] albums: " + albums.orderBy("album_id").collect().mkString("; "))
    println("[demo] bridge: " + SpotifyPipeline.albumArtistBridge(rawAlbums)
      .orderBy("album_id", "artist_id").collect().mkString("; "))

    // get-or-create provisioning, like the reference's bucket bootstrap
    // (create_bucket.py) — second call is a no-op
    val created = graft.operators.Shuffles.provisionTable(
      spark, "demo_album", albums.schema, s"$dir/out/album")
    val again = graft.operators.Shuffles.provisionTable(
      spark, "demo_album", albums.schema, s"$dir/out/album")
    println(s"[demo] provision: created=$created re-run created=$again")

    SpotifyPipeline.writeEntity(albums, s"$dir/out", "album", "2024-06-01")
    SpotifyPipeline.writeEntity(albums, s"$dir/out", "album", "2024-06-01") // idempotent re-run
    val back = spark.read.parquet(s"$dir/out/album")
    println(s"[demo] readback rows=${back.count()} partitions=" +
      back.select("ingest_date").distinct().collect().mkString(","))
    spark.stop()
  }
}
