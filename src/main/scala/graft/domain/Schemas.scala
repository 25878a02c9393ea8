package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for the Spotify-domain artifacts the reference pipeline
  * produces/consumes (mirrored from /root/reference artifacts; field lists at
  * sp_airflow/dags/spotify_etl_v2.py:118-124, 162-183, 244-263 and
  * scripts/create_artist_batches.py:32, search_artist_id_and_name.py:46).
  *
  * Everything nullable — the reference builds rows with `dict.get()`, so any
  * absent key is null (FIXTURES.md §B). Raw payload schemas keep the nested
  * shape of the API response; flat entity schemas are the transform outputs.
  * Always `spark.read.schema(...)` — never infer — so malformed payloads
  * degrade to nulls exactly like `dict.get`.
  */
object Schemas {

  /** Raw artist payload: `followers` is a nested object; the pipeline keeps
    * `followers.total` (spotify_etl_v2.py:122). */
  val rawArtist: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("followers", StructType(Seq(
      StructField("href", StringType),
      StructField("total", LongType)))),
    StructField("popularity", LongType)))

  /** Raw album payload with its `artists` array (spotify_etl_v2.py:159-183). */
  val rawAlbum: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("release_date", StringType), // variable precision: yyyy[-MM[-dd]]
    StructField("album_type", StringType),
    StructField("total_tracks", LongType),
    StructField("album_group", StringType),
    StructField("artists", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType)))))))

  /** Raw track payload with its `artists` array (spotify_etl_v2.py:241-263). */
  val rawTrack: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("track_number", LongType),
    StructField("duration_ms", LongType),
    StructField("artists", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType)))))))

  /** Flat entities (the 5 warehouse tables, spotify_etl_v2.py:327-331,390). */
  val artist: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_name", StringType),
    StructField("followers", LongType),
    StructField("popularity", LongType)))

  val album: StructType = StructType(Seq(
    StructField("album_id", StringType),
    StructField("album_name", StringType),
    StructField("release_date", StringType),
    StructField("type", StringType),
    StructField("total_tracks", LongType),
    StructField("album_group", StringType)))

  val albumArtists: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_name", StringType),
    StructField("album_id", StringType),
    StructField("album_name", StringType)))

  val track: StructType = StructType(Seq(
    StructField("track_id", StringType),
    StructField("track_name", StringType),
    StructField("track_number", LongType),
    StructField("duration_ms", LongType)))

  val trackArtists: StructType = StructType(Seq(
    StructField("track_id", StringType),
    StructField("track_name", StringType),
    StructField("artist_id", StringType),
    StructField("artist_name", StringType)))

  /** Batch object (create_artist_batches.py:32). */
  val nameBatch: StructType = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("artist_names", ArrayType(StringType))))

  /** Id-resolution record (search_artist_id_and_name.py:46). */
  val idResolution: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_name", StringType)))
}
