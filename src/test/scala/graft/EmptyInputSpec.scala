package graft

/** Zero-row input contract (round-13 hardening): every query must RUN on
  * empty tables — at 100 TB a partition-pruned read, a hard filter, or a
  * just-provisioned table legitimately yields zero rows, and a query that
  * throws on them is a production incident. The full 342-query sweep runs
  * in the round gate (`graft.DevEmptyBoard`, dev/round_check.sh gate 2½);
  * this spec pins the 16 queries that USED to throw (driver-side bounded
  * collects assuming ≥1 row: probe fetches, seed centroids, bloom build,
  * Markov grid, MMR pool) so the regression net is in `sbt test` too.
  *
  * Contract: empty input → empty result, SAME schema as the sf0.001 run
  * (so unions/sinks behave), no exception.
  */
class EmptyInputSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {

  /** 0-row copies of the fixture tables, schema preserved via limit(0)
    * over the real parquet footers. Deleted in afterAll (the
    * CheckpointsSpec lesson: suite temp dirs must not outlive the run). */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_spec").toString
    Tables.entityNames.foreach { t =>
      spark.read.parquet(s"$SF/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  override def afterAll(): Unit = {
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(emptyDir))
    finally super.afterAll()
  }

  private val fixedQueries = Seq(
    "q_ann_exhaustive", "q_ann_ivf", "q_ann_lsh", "q_ann_lsh_exact",
    "q_bloom_semi_join", "q_cluster_purity", "q_cosine_topk",
    "q_kmeans_step", "q_knn_join_blocked", "q_markov_attribution",
    "q_mips", "q_mmr_rerank", "q_quantized_rerank", "q_rank_fusion",
    "q_sem_dedup", "q_silhouette")

  fixedQueries.foreach { name =>
    test(s"$name: empty input -> empty result, schema preserved") {
      val onEmpty = Queries.all(name)(spark, emptyDir)
      assert(onEmpty.count() === 0L, s"$name must emit no rows on empty input")
      val full = Queries.all(name)(spark, SF)
      assert(onEmpty.schema.map(f => (f.name, f.dataType)) ===
        full.schema.map(f => (f.name, f.dataType)),
        s"$name empty-input schema must match the non-empty schema")
    }
  }

  test("bloom prefilter sentinel never widens the semi-join result") {
    import org.apache.spark.sql.functions.col
    // The empty-build-side fix unions a sentinel key into the sketch; the
    // exact semi-join behind the filter must still decide truth — compare
    // against the plain semi-join on the real fixture.
    val left = Tables.lineitem(spark, SF)
    val right = Tables.orders(spark, SF)
      .where(col("o_totalprice") > 300000).select("o_orderkey")
    val bloom = operators.Shuffles
      .bloomSemiJoin(left, right, "l_orderkey", "o_orderkey", 1000L)
      .select("l_orderkey", "l_linenumber")
    val plain = left.join(right, left("l_orderkey") === right("o_orderkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  // --- round-14: the two crashers the 3-row gate sweep caught -------------

  test("q_mmr_rerank: a 1-4 candidate pool yields pool-size steps, no crash") {
    import org.apache.spark.sql.functions.col
    // 3-row slices of every table (the gate's rows=3 shape): the MMR pool
    // is the ≤2-3 embeddings left after removing the probe — the greedy
    // loop must stop at the pool, not minBy over an empty remainder.
    val dir = java.nio.file.Files.createTempDirectory("graft_3row_spec").toString
    try {
      Tables.entityNames.foreach { t =>
        spark.read.parquet(s"$SF/$t.parquet").limit(3)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      val pool = Tables.embeddings(spark, dir).where(col("vec_id") =!= 0).count()
      val hasProbe = Tables.embeddings(spark, dir).where(col("vec_id") === 0).count() > 0
      val expected = if (hasProbe) math.min(5L, pool) else 0L
      assert(Queries.all("q_mmr_rerank")(spark, dir).count() === expected,
        s"MMR on a $pool-candidate pool must select exactly min(5, pool)")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q_chi2_tokens: a single-language corpus (zero margin) scores 0, no crash") {
    import org.apache.spark.sql.functions.{col, lit}
    // All docs forced to one lang: the contingency margins b and d are 0
    // for every token, the 2x2 table is degenerate, and the guarded
    // statistic must be the 0/0 limit (0.0) instead of an ANSI
    // divide-by-zero.
    val dir = java.nio.file.Files.createTempDirectory("graft_1lang_spec").toString
    try {
      spark.read.parquet(s"$SF/documents.parquet").limit(3)
        .withColumn("lang", lit("en"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Queries.all("q_chi2_tokens")(spark, dir)
      assert(got.count() > 0,
        "the min-support screen must keep at least one token on fixture docs " +
          "(otherwise this test exercises nothing)")
      assert(got.where(col("chi2") =!= 0.0).count() === 0L,
        "every chi2 on a degenerate 2x2 table must be the 0/0 limit (0.0)")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
