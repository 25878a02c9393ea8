package graft

import java.nio.file.Files

import graft.domain.SpotifyPipeline
import graft.sources.RestLookup

class PipelineE2ESpec extends SparkSuite {
  import spark.implicits._

  test("runDaily: raw JSON -> five partitioned entity tables, idempotent re-run") {
    val raw = Files.createTempDirectory("graft_raw").toString
    val out = Files.createTempDirectory("graft_out").toString
    Files.writeString(java.nio.file.Paths.get(s"$raw/artist.json"),
      """{"id":"a1","name":"A","followers":{"total":10},"popularity":1}
        |{"id":"a2","name":"B","followers":{"total":20},"popularity":2}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$raw/album.json"),
      """{"id":"al1","name":"X","release_date":"2020-02","album_type":"album","total_tracks":2,"artists":[{"id":"a1","name":"A"}]}
        |{"id":"al1","name":"XDup","release_date":"2021","album_type":"single","total_tracks":1,"artists":[{"id":"a2","name":"B"}]}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$raw/track.json"),
      """{"id":"t1","name":"T","track_number":1,"duration_ms":1000,"artists":[{"id":"a1","name":"A"},{"id":"a2","name":"B"}]}""".stripMargin)

    SpotifyPipeline.runDaily(spark, raw, out, "2024-06-01")
    SpotifyPipeline.runDaily(spark, raw, out, "2024-06-01") // idempotent

    val artist = spark.read.parquet(s"$out/artist")
    val album = spark.read.parquet(s"$out/album")
    val albumBridge = spark.read.parquet(s"$out/album_artists")
    val track = spark.read.parquet(s"$out/track")
    val trackBridge = spark.read.parquet(s"$out/track_artists")
    assert(artist.count() == 2)
    assert(album.count() == 1) // first-wins dedup on album_id
    assert(album.select("album_name").as[String].head() == "X")
    assert(albumBridge.count() == 2) // both artists across the dup payloads
    assert(track.count() == 1)
    assert(trackBridge.count() == 2)
    assert(artist.select("ingest_date").distinct().as[String].collect().toSeq ==
      Seq("2024-06-01"))
  }

  test("RestLookup: chunked 1:N expansion, inner-join skip, flaky-chunk retry") {
    val calls = spark.sparkContext.longAccumulator("calls")
    val keys = (1 to 101).map(i => s"name_$i").toDS().repartition(2)
    val lookup: Seq[String] => Seq[(String, String)] = { chunk =>
      calls.add(1)
      assert(chunk.size <= 50)
      chunk.filterNot(_ == "name_7") // name_7 resolves to nothing
        .flatMap(k => Seq(k -> s"${k}_id1", k -> s"${k}_id2")) // 1:2 expansion
    }
    val out = RestLookup.lookupJoin[String, String](keys, lookup, chunkSize = 50)
      .collect()
    assert(out.length == 200) // (101-1) keys x 2 candidates
    assert(!out.exists(_._1 == "name_7"))
    assert(calls.value >= 3) // 101 keys / 50 per chunk, across partitions

    // a chunk that fails twice then succeeds is retried, not lost
    val attempts = spark.sparkContext.collectionAccumulator[Int]("attempts")
    val flaky: Seq[String] => Seq[(String, String)] = { chunk =>
      attempts.add(1)
      if (attempts.value.size <= 2) throw new RuntimeException("transient")
      chunk.map(k => k -> "ok")
    }
    val single = (1 to 5).map(i => s"k$i").toDS().repartition(1)
    val resolved = RestLookup.lookupJoin[String, String](single, flaky, chunkSize = 10)
      .collect()
    assert(resolved.length == 5)
  }

  test("resolveColumn drops unresolved keys like the reference's inner semantics") {
    val df = Seq("A", "B", "C").toDF("artist_name")
    val out = RestLookup.resolveColumn(df, "artist_name",
      chunk => chunk.filterNot(_ == "B").map(n => n -> s"id_$n"), "artist_id")
    val rows = out.orderBy("artist_name")
      .as[(String, String)].collect()
    assert(rows.toSeq == Seq(("A", "id_A"), ("C", "id_C")))
  }
}
