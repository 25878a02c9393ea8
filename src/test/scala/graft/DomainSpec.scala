package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.domain.{Schemas, SpotifyPipeline => P}

/** Unit fixtures mirror the reference's raw artifacts (FIXTURES.md §B):
  * nested `followers.total`, variable-precision release dates, duplicate
  * payloads, null/absent keys. */
class DomainSpec extends SparkSuite {
  import spark.implicits._

  private def json(schema: org.apache.spark.sql.types.StructType,
                   rows: String*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.read.schema(schema).json(
      spark.createDataset(rows.toList)(org.apache.spark.sql.Encoders.STRING))
  }

  test("parseArtistNames: trims, collapses, drops blank lines") {
    val lines = Seq("  Bad Bunny ", "", "   ", "Tyler,  The Creator", "ROSÉ").toDF("value")
    val out = P.parseArtistNames(lines).as[String].collect().toSeq
    assert(out == Seq("Bad Bunny", "Tyler, The Creator", "ROSÉ"))
  }

  test("nameBatches: 500-name batches with deterministic contents") {
    val names = (1 to 1001).map(i => f"artist_$i%04d").toDF("value")
    val out = P.nameBatches(P.parseArtistNames(names), 500)
      .orderBy("batch_id")
      .as[(Long, Seq[String])].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2.size == 500 && out(1)._2.size == 500 && out(2)._2.size == 1)
    assert(out(0)._2.head == "artist_0001")
  }

  test("searchQuery escapes embedded quotes like the reference") {
    val out = Seq("""The "Best" Band""").toDF("n")
      .select(P.searchQuery($"n")).as[String].collect()(0)
    assert(out == """artist:"The \"Best\" Band"""")
  }

  test("projectArtists: null-safe nested followers.total") {
    val raw = json(Schemas.rawArtist,
      """{"id":"a1","name":"Drake","followers":{"total":123,"href":null},"popularity":87}""",
      """{"id":"a2","name":"NoFollowers","popularity":11}""",
      """{"id":"a3","name":"NullTotal","followers":{"href":"x"}}""")
    val out = P.projectArtists(raw).orderBy("artist_id")
      .as[(String, String, Option[Long], Option[Long])].collect()
    assert(out(0) == (("a1", "Drake", Some(123L), Some(87L))))
    assert(out(1) == (("a2", "NoFollowers", None, Some(11L))))
    assert(out(2) == (("a3", "NullTotal", None, None)))
  }

  test("projectAlbums: first-wins dedup keeps the first-fetched payload") {
    val raw = json(Schemas.rawAlbum,
      """{"id":"al1","name":"First","release_date":"2024-01-31","album_type":"album","total_tracks":10}""",
      """{"id":"al1","name":"DupLater","release_date":"2020","album_type":"single","total_tracks":1}""",
      """{"id":"al2","name":"Other","release_date":"2023-05","album_type":"album","total_tracks":8}""")
      .withColumn("fetch_order", monotonically_increasing_id())
    val out = P.projectAlbums(raw, col("fetch_order")).orderBy("album_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("album_name") == "First")
  }

  test("parseReleaseDate handles all three precisions plus garbage") {
    val df = Seq("2024-01-31", "2024-01", "2024", "not-a-date", "").toDF("rd")
    val out = df.select(P.parseReleaseDate($"rd").cast("string")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("2024-01-31"), Some("2024-01-01"), Some("2024-01-01"), None, None))
  }

  test("albumArtistBridge: explodes, drops null artists, dedups pairs") {
    val raw = json(Schemas.rawAlbum,
      """{"id":"al1","name":"A","artists":[{"id":"ar1","name":"X"},{"id":"ar2","name":"Y"},{"id":"ar1","name":"X"}]}""",
      """{"id":"al2","name":"B","artists":[{"id":"ar1","name":"X"}]}""",
      """{"id":"al3","name":"C"}""")
    val out = P.albumArtistBridge(raw).orderBy("album_id", "artist_id")
      .select("artist_id", "album_id").as[(String, String)].collect()
    assert(out.toSeq == Seq(("ar1", "al1"), ("ar2", "al1"), ("ar1", "al2")))
  }

  test("trackArtistBridge + projectTracks round-trip") {
    val raw = json(Schemas.rawTrack,
      """{"id":"t1","name":"Song","track_number":3,"duration_ms":201000,"artists":[{"id":"ar1","name":"X"}]}""",
      """{"id":"t1","name":"SongDup","track_number":3,"duration_ms":201000,"artists":[{"id":"ar2","name":"Y"}]}""")
      .withColumn("fetch_order", monotonically_increasing_id())
    val tracks = P.projectTracks(raw, col("fetch_order")).collect()
    assert(tracks.length == 1 && tracks(0).getAs[String]("track_name") == "Song")
    val bridge = P.trackArtistBridge(raw).orderBy("artist_id")
      .select("track_id", "artist_id").as[(String, String)].collect()
    assert(bridge.toSeq == Seq(("t1", "ar1"), ("t1", "ar2")))
  }

  test("dailySample: date-seeded, stable within a date, different across dates") {
    val ids = (1 to 100).map(i => s"id_$i").toDF("artist_id")
    val d1a = P.dailySample(ids, 20240101L, 20).as[String].collect().toSeq
    val d1b = P.dailySample(ids, 20240101L, 20).as[String].collect().toSeq
    val d2 = P.dailySample(ids, 20240102L, 20).as[String].collect().toSeq
    assert(d1a == d1b && d1a.size == 20)
    assert(d1a != d2)
  }

  test("distinctArtistIds drops nulls/empties across unioned inputs") {
    val a = json(Schemas.idResolution,
      """{"artist_id":"x","artist_name":"X"}""",
      """{"artist_id":"","artist_name":"empty"}""")
    val b = json(Schemas.idResolution,
      """{"artist_id":"x","artist_name":"X dup"}""",
      """{"artist_name":"missing id"}""")
    val out = P.distinctArtistIds(a.unionByName(b)).as[String].collect().toSeq
    assert(out == Seq("x"))
  }

  test("writeEntity: partitioned parquet layout with dynamic overwrite idempotence") {
    val dir = java.nio.file.Files.createTempDirectory("graft_domain").toString
    val artists = P.projectArtists(json(Schemas.rawArtist,
      """{"id":"a1","name":"Drake","followers":{"total":123},"popularity":87}"""))
    P.writeEntity(artists, dir, "artist", "2024-01-01")
    P.writeEntity(artists, dir, "artist", "2024-01-01") // re-run same date: no dup
    P.writeEntity(artists, dir, "artist", "2024-01-02")
    val back = spark.read.parquet(s"$dir/artist")
    assert(back.count() == 2)
    assert(back.select("ingest_date").distinct().count() == 2)
  }

  test("transform produces all five entity frames lazily") {
    val ra = json(Schemas.rawArtist, """{"id":"a1","name":"A","followers":{"total":1},"popularity":2}""")
    val rb = json(Schemas.rawAlbum, """{"id":"al1","name":"B","artists":[{"id":"a1","name":"A"}]}""")
      .withColumn("fetch_order", monotonically_increasing_id())
    val rt = json(Schemas.rawTrack, """{"id":"t1","name":"T","track_number":1,"duration_ms":1000,"artists":[{"id":"a1","name":"A"}]}""")
      .withColumn("fetch_order", monotonically_increasing_id())
    val entities = P.transform(ra, rb, rt, col("fetch_order"))
    assert(entities.keySet == Set("artist", "album", "album_artists", "track", "track_artists"))
    entities.values.foreach(df => assert(df.count() == 1))
  }
}
