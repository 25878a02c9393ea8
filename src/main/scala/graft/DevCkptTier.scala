package graft

/** Dev tool: measured cost of the reliable-checkpoint durability tier.
  *
  * [[graft.operators.Checkpoints]] offers two lineage-cut tiers: the
  * `localCheckpoint()` default (executor-pinned blocks, zero DFS traffic,
  * dies with an executor) and reliable `checkpoint()` under
  * `graft.checkpoint.dir` (survives executor loss/preemption — the 100-TB
  * posture for spot fleets, at one DFS round-trip per iteration). The
  * claim needs a measured price: this tool times the heavy iterative
  * queries under BOTH tiers at 1× and reps× ([[DevReplicas]] organic-
  * growth replica), recording wall seconds and the bytes each reliable
  * run actually writes under the checkpoint directory (counted after the
  * sink completes, before [[graft.operators.Checkpoints.release]]
  * reclaims the round dirs).
  *
  * `runMain graft.DevCkptTier [srcDir] [reps] [q1,q2,...]` — results feed
  * the SCALING.md durability-tier table.
  *
  * `runMain graft.DevCkptTier --restart [srcDir] [killAt]` — the round-15
  * restart drill pricing the tier's OTHER half: under the resumable tier
  * ([[graft.operators.IterResume]]), kill `q_pagerank_iter` right after
  * round `killAt` commits, restart, and report (a) rounds re-executed —
  * must be 0 for rounds 1..killAt — and (b) recompute-avoided seconds =
  * unkilled wall − resumed wall, i.e. what a preempted spot fleet gets
  * back per driver loss. */
object DevCkptTier {
  val Heavies = Seq("q_pagerank_iter", "q_graph_components", "q_kcore",
    "q_leakage_split", "q_bfs_levels")

  def restartDrill(args: Array[String]): Unit = {
    val src0   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val killAt = if (args.length > 1) args(1).toInt else 3
    val reps   = if (args.length > 2) args(2).toInt else 1
    val spark  = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val src    = if (reps > 1) DevReplicas.ensure(spark, src0, reps) else src0
    import graft.operators.IterResume
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_restart").toString
    spark.conf.set(IterResume.DirConf, dir)
    // Unkilled baseline under the SAME tier (so the delta isolates the
    // restart, not the tier's per-round commit cost), warm then timed.
    Queries.pagerankTrace(spark, src)
    graft.operators.Checkpoints.release(spark)
    deleteRec(dir)
    val ((_, roundsFull), wallFull) = timed(Queries.pagerankTrace(spark, src))
    val truth = Queries.pagerankTrace(spark, src)._1.orderBy("round")
      .collect().toSeq // fully-committed: 0 rounds re-executed, trace read back
    deleteRec(dir)
    // Kill after round `killAt` commits, then restart.
    spark.conf.set(IterResume.FailAfterConf, killAt.toString)
    val (_, wallPre) = timed(
      try { Queries.pagerankTrace(spark, src); sys.error("kill did not fire") }
      catch { case e: IllegalStateException if e.getMessage.contains("injected kill") => () })
    spark.conf.unset(IterResume.FailAfterConf)
    val ((resumed, executed), wallResume) = timed(Queries.pagerankTrace(spark, src))
    val same = resumed.orderBy("round").collect().toSeq == truth
    println(f"[restart] q_pagerank_iter killAt=$killAt roundsFull=$roundsFull " +
      f"wallFull=$wallFull%.2f s wallToKill=$wallPre%.2f s wallResume=$wallResume%.2f s " +
      f"roundsReExecuted=${executed - (roundsFull - killAt)} " +
      f"recomputeAvoided=${wallFull - wallResume}%.2f s traceIdentical=$same")
    spark.conf.unset(IterResume.DirConf)
    spark.stop()
    if (!same || executed != roundsFull - killAt) sys.exit(1)
  }

  private def deleteRec(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally s.close()
    }
    java.nio.file.Files.createDirectories(root)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--restart")) return restartDrill(args.drop(1))
    val src   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = if (args.length > 1) args(1).toInt else 10
    val names = if (args.length > 2) args(2).split(",").toSeq else Heavies
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dst   = DevReplicas.ensure(spark, src, reps)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_tier").toString

    def bytesUnder(dir: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }

    for ((label, dir) <- Seq("1x" -> src, s"${reps}x" -> dst);
         tier <- Seq("local", "reliable")) {
      if (tier == "reliable")
        spark.conf.set(graft.operators.Checkpoints.DirConf, ckptDir)
      else
        spark.conf.unset(graft.operators.Checkpoints.DirConf)
      names.foreach { name =>
        val fn = Queries.all(name)
        fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
        graft.operators.Checkpoints.release(spark)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          val wall = (System.nanoTime() - t0) / 1e9
          val b = if (tier == "reliable") bytesUnder(ckptDir) else 0L
          graft.operators.Checkpoints.release(spark)
          (wall, b)
        }
        println(f"[ckpt] $label%-4s $tier%-8s $name%-20s " +
          f"wall=${runs.map(_._1).min}%7.2f s  ckpt_mb=${runs.map(_._2).max / 1e6}%9.1f")
      }
    }
    spark.stop()
  }
}
