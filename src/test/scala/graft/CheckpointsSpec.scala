package graft

import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** The quiescent-point release contract Bench/Verify rely on (the round-5
  * lesson: stranded checkpoint generations contending across queries cost
  * 90.9 s): after a query's sink has fully materialized,
  * [[Checkpoints.release]] must actually free what [[Checkpoints.truncate]]
  * pinned — the persisted block registrations on the local tier, the
  * per-round `rdd-*` directories on the durable tier. */
class CheckpointsSpec extends SparkSuite {

  private def truncated() = Checkpoints.truncate(
    Tables.events(spark, SF).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")))

  test("release frees localCheckpoint block registrations (local tier)") {
    val sc = spark.sparkContext
    Checkpoints.release(spark) // start from a clean block manager
    assert(sc.getPersistentRDDs.isEmpty)
    val df = truncated()
    assert(df.count() > 0)
    assert(sc.getPersistentRDDs.nonEmpty,
      "localCheckpoint must pin blocks — an empty map would make this test vacuous")
    Checkpoints.release(spark)
    assert(sc.getPersistentRDDs.isEmpty,
      "release must drop every persisted-RDD registration")
  }

  // Ordering assumption (documented, not accidental): setCheckpointDir is
  // CONTEXT-GLOBAL and first-nonempty-wins, so this test leaves the shared
  // JVM session's checkpoint dir pointing at the temp path below for the
  // rest of the suite run. That is harmless ONLY because (a) the finally
  // block deletes the directory, and (b) Checkpoints.release guards its
  // sweep with fs.exists — a later suite's release sees a nonexistent path
  // and no-ops instead of sweeping live data. No other suite sets DirConf;
  // a second durable-tier consumer in this JVM would inherit this dir.
  test("release reclaims durable checkpoint directories (durable tier)") {
    val sc = spark.sparkContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    spark.conf.set(Checkpoints.DirConf, tmp.toString)
    try {
      val df = truncated()
      assert(df.count() > 0)
      assert(sc.getCheckpointDir.nonEmpty, "durable tier must set the context dir")
      val p = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      val fs = p.getFileSystem(sc.hadoopConfiguration)
      assert(fs.listStatus(p).nonEmpty,
        "reliable checkpoint must have written rdd-* directories")
      Checkpoints.release(spark)
      assert(fs.listStatus(p).isEmpty,
        "release must reclaim every per-round checkpoint directory")
      assert(sc.getPersistentRDDs.isEmpty)
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      val p = new org.apache.hadoop.fs.Path(tmp.toString)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
  }
}
