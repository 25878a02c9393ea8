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

  test("readLinesNumbered: __fetch is the (file, byte-offset), invariant under split size") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_num").toString + "/raw"
    new java.io.File(dir).mkdirs()
    val lines = (0 until 200).map(i => s"""{"artist_id":"a${i % 7}","artist_name":"row$i"}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part0.json"), lines.mkString("\n"))

    def fetchOrder(): Seq[(String, Long, String)] = {
      val df = JsonArtifacts.readLinesNumbered(spark, dir, Schemas.idResolution)
      df.orderBy("__fetch").select("__fetch.__file", "__fetch.__offset", "artist_name")
        .as[(String, Long, String)].collect().toSeq
    }
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val coarse = fetchOrder()
    try {
      hc.set(key, "256") // force many tiny splits
      val fine = fetchOrder()
      // offsets are within-FILE, so the order is identical however the
      // file is split — this is the property monotonically_increasing_id
      // does not have.
      assert(fine == coarse)
    } finally hc.unset(key)
    assert(coarse.map(_._3) == (0 until 200).map(i => s"row$i"))
    // first-wins dedup keyed on __fetch reproduces file order
    val deduped = graft.operators.Ops.dedupFirstWins(
      JsonArtifacts.readLinesNumbered(spark, dir, Schemas.idResolution),
      Seq("artist_id"), Seq(org.apache.spark.sql.functions.col("__fetch")))
    val winners = deduped.select("artist_name").as[String].collect().toSet
    assert(winners == (0 until 7).map(i => s"row$i").toSet)
  }

  test("lines round-trip preserves the record set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_rt").toString + "/out"
    val df = Seq(("a1", "X"), ("a2", "Y"), ("a3", "Z")).toDF("artist_id", "artist_name")
    JsonArtifacts.writeLines(df, dir)
    val back = JsonArtifacts.readLines(spark, dir, Schemas.idResolution)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("ParquetMeta.rowCount matches a full count, single file and partitioned tree") {
    import graft.sources.ParquetMeta
    for (t <- Seq("nation", "lineitem", "events"))
      assert(ParquetMeta.rowCount(spark, s"$SF/$t.parquet")
        == spark.read.parquet(s"$SF/$t.parquet").count(), t)
    // multi-file partitioned layout: footer counts must sum across the tree
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    val ev = Tables.events(spark, SF)
    ev.withColumn("d", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
      .repartition(4).write.mode("overwrite").partitionBy("d").parquet(dir)
    assert(ParquetMeta.rowCount(spark, dir) == ev.count())
  }
}
