package graft

import graft.domain.Schemas
import graft.sources.JsonArtifacts

class JsonArtifactsSpec extends SparkSuite {
  import spark.implicits._

  test("readArray parses a JSON-array artifact with enforced schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    java.nio.file.Files.writeString(dir.resolve("artist.json"),
      """[{"artist_id":"a1","artist_name":"X","followers":5,"popularity":9},
        | {"artist_id":"a2","artist_name":"Y"}]""".stripMargin)
    val df = JsonArtifacts.readArray(spark, dir.toString, Schemas.artist)
    val rows = df.orderBy("artist_id")
      .as[(String, String, Option[Long], Option[Long])].collect()
    assert(rows.toSeq == Seq(
      ("a1", "X", Some(5L), Some(9L)), ("a2", "Y", None, None)))
  }

  test("malformed payload degrades to nulls, never flips the schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_bad")
    java.nio.file.Files.writeString(dir.resolve("artist.json"),
      """[{"artist_id":"a1","artist_name":"X","followers":"not-a-number"}]""")
    val df = JsonArtifacts.readArray(spark, dir.toString, Schemas.artist)
    assert(df.schema == Schemas.artist)
    // Spark's permissive mode nulls the whole malformed record
    val r = df.collect()(0)
    assert(r.isNullAt(r.fieldIndex("followers")))
  }

  test("writeLinesIdempotent skips existing targets (if_generation_match analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_idem").toString + "/out"
    val first = Seq(("a1", "X")).toDF("artist_id", "artist_name")
    val second = Seq(("a2", "Y")).toDF("artist_id", "artist_name")
    JsonArtifacts.writeLinesIdempotent(first, dir)
    JsonArtifacts.writeLinesIdempotent(second, dir) // must be ignored
    val back = JsonArtifacts.readLines(spark, dir, Schemas.idResolution)
    assert(back.as[(String, String)].collect().toSeq == Seq(("a1", "X")))
  }

  test("lines round-trip preserves the record set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_rt").toString + "/out"
    val df = Seq(("a1", "X"), ("a2", "Y"), ("a3", "Z")).toDF("artist_id", "artist_name")
    JsonArtifacts.writeLines(df, dir)
    val back = JsonArtifacts.readLines(spark, dir, Schemas.idResolution)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
