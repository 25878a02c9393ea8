package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    val df = edges.toDF("s", "t").repartition(parts)
    val cc = Graph.connectedComponents(df, "s", "t")
    val out = cc.as[(Long, Long)].collect().toMap
    cc.unpersist()
    out
  }

  test("connectedComponents: two triangles + bridge node, singleton edge") {
    // {1,2,3} triangle, {10,11,12} triangle joined to it via 3-10; {20,21}
    val cc = components(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L),
      (20L, 21L)))
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(cc(_) == 1L), cc.toString)
    assert(cc(20L) == 20L && cc(21L) == 20L, cc.toString)
  }

  test("connectedComponents: a long path collapses within the log-round budget") {
    // path 0-1-2-...-40: diameter 40, but pointer jumping must converge
    // well inside the default 20 rounds (geometric collapse)
    val path = (0L until 40L).map(i => (i, i + 1))
    val cc = components(path)
    assert(cc.values.toSet == Set(0L), s"all 41 nodes must label 0: $cc")
  }

  test("connectedComponents: deterministic across partition counts") {
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (3L, 5L), (8L, 1L), (4L, 6L))
    val a = components(edges, parts = 1)
    val b = components(edges, parts = 13)
    assert(a == b)
    assert(a(2L) == 2L && a(9L) == 2L && a(5L) == 2L && a(3L) == 2L)
    assert(a(1L) == 1L && a(7L) == 1L && a(8L) == 1L)
    assert(a(4L) == 4L && a(6L) == 4L)
  }

  test("checkpoint durability tiers agree: local vs reliable (graft.checkpoint.dir)") {
    import graft.operators.Checkpoints
    // local-mode tier (conf unset) — the default every other test exercises
    val local = Queries.qKcore(spark, SF).collect().toSeq
    // durable tier: same query, every truncation now a reliable checkpoint
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val reliable = Queries.qKcore(spark, SF).collect().toSeq
      assert(local == reliable,
        s"durability tier must not change results:\nlocal=$local\nreliable=$reliable")
      // the durable path actually wrote checkpoint data to the DFS dir
      // getCheckpointDir is a URI string (file:/...) — resolve via URI
      val ckpt = java.nio.file.Paths.get(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get))
      val wrote = java.nio.file.Files.walk(ckpt)
        .anyMatch(p => java.nio.file.Files.isRegularFile(p))
      assert(wrote, "reliable mode must materialize checkpoint files")
      // release() is the quiescent point: it must reclaim the per-round
      // rdd-* checkpoint dirs (Spark itself only does so under
      // cleaner.referenceTracking.cleanCheckpoints, GC-timing-dependent)
      Checkpoints.release(spark)
      val remaining = java.nio.file.Files.list(ckpt).count()
      assert(remaining == 0L,
        s"release() must reclaim durable checkpoint dirs, $remaining left")
    } finally spark.conf.unset(Checkpoints.DirConf)
  }
}
