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
