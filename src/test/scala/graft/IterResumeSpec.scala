package graft

import graft.operators.IterResume

/** Restart drill for the resumable iteration tier (round-15, VERDICT
  * item 6): the reliable-checkpoint story's untested half was that after
  * a mid-iteration kill, a restart RESUMES from the last committed round
  * instead of recomputing rounds 1..k — and produces the identical
  * answer. The kill is injected by [[IterResume.FailAfterConf]] exactly
  * at the between-rounds commit point a preemption would hit. */
class IterResumeSpec extends SparkSuite {

  private def withResume[A](dir: String, failAfter: Option[Int])(body: => A): A = {
    spark.conf.set(IterResume.DirConf, dir)
    failAfter.foreach(k => spark.conf.set(IterResume.FailAfterConf, k.toString))
    try body
    finally {
      spark.conf.unset(IterResume.DirConf)
      spark.conf.unset(IterResume.FailAfterConf)
    }
  }

  test("pagerank restart resumes after a mid-iteration kill: no round re-executed, trace identical") {
    // Truth: an unkilled, non-resumable run (the default tier).
    val (truthDf, truthRounds) = Queries.pagerankTrace(spark, SF)
    val truth = truthDf.orderBy("round").collect().toSeq
    assert(truthRounds >= 3, s"drill needs >2 rounds to kill inside: $truthRounds")

    val dir = java.nio.file.Files.createTempDirectory("graft_iter_resume").toString
    val killAt = 2
    // Run 1: killed right after round `killAt` commits.
    val e = intercept[IllegalStateException] {
      withResume(dir, Some(killAt)) { Queries.pagerankTrace(spark, SF) }
    }
    assert(e.getMessage.contains(s"injected kill after round $killAt"), e.getMessage)

    // Run 2: fresh call, same directory — must resume at round killAt+1.
    val (resumedDf, executed) = withResume(dir, None) { Queries.pagerankTrace(spark, SF) }
    assert(executed == truthRounds - killAt,
      s"restart must not re-execute committed rounds: executed $executed, " +
        s"want ${truthRounds - killAt}")
    val resumed = resumedDf.orderBy("round").collect().toSeq
    assert(resumed == truth,
      s"resumed trace must be identical to the unkilled run's:\n" +
        s"got  $resumed\nwant $truth")

    // And an immediately-converged resume (everything already committed):
    // zero rounds execute, the trace still reads back whole. The prior
    // run committed rounds killAt+1..truthRounds, so resume() finds the
    // full set.
    val (againDf, executedAgain) = withResume(dir, None) { Queries.pagerankTrace(spark, SF) }
    assert(executedAgain == 0,
      s"fully-committed run must execute 0 rounds: $executedAgain")
    assert(againDf.orderBy("round").collect().toSeq == truth)
  }

  test("connected components resume after a kill: committed round untouched, fixpoint identical") {
    import spark.implicits._
    // Two path components (1-2-3-4-5, 10-11-12): min-label + pointer
    // jumping needs several rounds, so a kill after round 1 lands
    // mid-iteration.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L)).toDF("a", "b")
    val truth = graft.operators.Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(truth.map(_._2).distinct.sorted == Seq(1L, 10L))

    val dir = java.nio.file.Files.createTempDirectory("graft_cc_resume").toString
    val e = intercept[IllegalStateException] {
      withResume(dir, Some(1)) {
        graft.operators.Graph.connectedComponents(edges, "a", "b").collect()
      }
    }
    assert(e.getMessage.contains("injected kill after round 1"), e.getMessage)
    // The committed round must not be re-executed on resume: its commit
    // marker keeps its mtime.
    val marker = java.nio.file.Paths.get(s"$dir/components/round=1/ranks/_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val resumed = withResume(dir, None) {
      graft.operators.Graph.connectedComponents(edges, "a", "b")
        .as[(Long, Long)].collect().toSeq.sorted
    }
    assert(resumed == truth, s"resumed fixpoint differs:\n$resumed\n$truth")
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "round 1 must not be recomputed or rewritten on resume")
    // And pagerank + components can share one resume conf without their
    // round sequences colliding (kernel-namespaced subdirs).
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/components")))
  }

  test("bfs levels resume after a kill: committed round untouched, levels identical") {
    val truth = Queries.qBfsLevels(spark, SF).collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_resume").toString
    val e = intercept[IllegalStateException] {
      withResume(dir, Some(1)) { Queries.qBfsLevels(spark, SF).collect() }
    }
    assert(e.getMessage.contains("injected kill after round 1"), e.getMessage)
    val marker = java.nio.file.Paths.get(s"$dir/bfs/round=1/ranks/_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val resumed = withResume(dir, None) {
      Queries.qBfsLevels(spark, SF).collect().toSeq
    }
    assert(resumed == truth, "resumed BFS levels differ from the unkilled run's")
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "round 1 must not be recomputed or rewritten on resume")
  }

  test("lsh cluster fixpoint (leakage split) resumes after a kill with identical splits") {
    val (truthDf, truthRounds) = Queries.leakageSplitTrace(spark, SF)
    val truth = truthDf.collect().toSeq
    assert(truthRounds >= 2, s"drill needs >=2 rounds to kill inside: $truthRounds")
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_resume").toString
    val e = intercept[IllegalStateException] {
      withResume(dir, Some(1)) { Queries.leakageSplitTrace(spark, SF)._1.collect() }
    }
    assert(e.getMessage.contains("injected kill after round 1"), e.getMessage)
    val marker = java.nio.file.Paths.get(s"$dir/lshclusters/round=1/ranks/_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val resumed = withResume(dir, None) {
      Queries.leakageSplitTrace(spark, SF)._1.collect().toSeq
    }
    assert(resumed == truth, "resumed leakage split differs from the unkilled run's")
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "round 1 must not be recomputed or rewritten on resume")
  }

  test("resuming against altered input fails fast: the manifest binds the directory to one run") {
    import spark.implicits._
    val edgesA = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val edgesB = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 6L)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_manifest").toString
    // Run over A, killed mid-iteration — rounds committed under A's identity.
    intercept[IllegalStateException] {
      withResume(dir, Some(1)) {
        graft.operators.Graph.connectedComponents(edgesA, "a", "b").collect()
      }
    }
    // Resuming over B must throw LOUDLY, not return A's fixpoint: the
    // silent-wrong-answer mode the r15 scaladoc declared "the caller's
    // error" is now mechanically detected.
    val e = intercept[IllegalStateException] {
      withResume(dir, None) {
        graft.operators.Graph.connectedComponents(edgesB, "a", "b").collect()
      }
    }
    assert(e.getMessage.contains("different run"), e.getMessage)
    // Same input but different kernel PARAMS is also a different run.
    val ep = intercept[IllegalStateException] {
      withResume(dir, None) {
        graft.operators.Graph.connectedComponents(edgesA, "a", "b", maxIter = 5).collect()
      }
    }
    assert(ep.getMessage.contains("different run"), ep.getMessage)
    // Unchanged input + params still resumes (manifest matches), and the
    // fixpoint is the unkilled run's.
    val truth = graft.operators.Graph.connectedComponents(edgesA, "a", "b")
      .as[(Long, Long)].collect().toSeq.sorted
    val resumed = withResume(dir, None) {
      graft.operators.Graph.connectedComponents(edgesA, "a", "b")
        .as[(Long, Long)].collect().toSeq.sorted
    }
    assert(resumed == truth)
    // The fingerprint is ORDER-independent: a shuffled same-content edge
    // frame is the same run (xor-fold + count, no row-order sensitivity).
    val shuffled = edgesA.orderBy(org.apache.spark.sql.functions.col("b").desc)
    val again = withResume(dir, None) {
      graft.operators.Graph.connectedComponents(shuffled, "a", "b")
        .as[(Long, Long)].collect().toSeq.sorted
    }
    assert(again == truth)
  }

  test("checkOrInit refuses a populated pre-manifest directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_premanifest").toString
    val state = Seq((1L, 10L)).toDF("n", "r")
    IterResume.commitState(state, dir, 1)
    IterResume.commitTrace(Seq((1L, 0L)).toDF("round", "changed"), dir, 1)
    val e = intercept[IllegalStateException] {
      IterResume.checkOrInit(spark, dir, "kernel=x;params=;rows=1;xor=0")
    }
    assert(e.getMessage.contains("no MANIFEST"), e.getMessage)
    // A fresh directory just writes the manifest and is idempotent.
    val fresh = java.nio.file.Files.createTempDirectory("graft_freshmanifest").toString
    IterResume.checkOrInit(spark, fresh, "kernel=x;params=;rows=1;xor=0")
    IterResume.checkOrInit(spark, fresh, "kernel=x;params=;rows=1;xor=0")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$fresh/MANIFEST")))
  }

  test("resume() ignores a torn round: state committed, trace not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_iter_torn").toString
    val state = Seq((1L, 10L)).toDF("n", "r")
    val trace = Seq((1L, 1L, 10L, 5L, 0L))
      .toDF("round", "n_nodes", "sum_rank_ppm", "max_delta_ppm", "converged")
    IterResume.commitState(state, dir, 1)
    IterResume.commitTrace(trace, dir, 1)
    // round 2 tears between the two writes (the kill window commitTrace
    // closes): ranks land, trace never does
    IterResume.commitState(state.withColumn("r", $"r" + 1), dir, 2)
    val Some((last, ranks, rows)) = IterResume.resume(spark, dir)
    assert(last == 1, s"torn round 2 must not be resumed: $last")
    assert(rows.map(_.getLong(0)) == Vector(1L))
    assert(ranks.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    // an empty / absent directory is a fresh run
    assert(IterResume.resume(spark,
      java.nio.file.Files.createTempDirectory("graft_iter_none").toString).isEmpty)
    assert(IterResume.resume(spark, "/tmp/graft_iter_does_not_exist_xyz").isEmpty)
  }
}
