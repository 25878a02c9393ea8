package graft

/** Dev tool: N whole-board sequential passes in ONE JVM, per-pass wall and
  * per-quarter sub-walls — the bench-degradation localizer. Built for the
  * round-13 investigation (bench sequential pass ran 1.3–1.5× its own
  * warmup while isolated DevTime re-times matched the previous round): if
  * pass 2+ inflates uniformly from the first query, the JVM accumulated
  * state after a full board pass (code cache, GC, cleaner backlog); if it
  * degrades gradually within a pass, something leaks per query.
  * An optional third argument restricts the board to a comma-separated
  * query subset — the `ab_prev.sh --quick` first-line A/B runs a ~40-query
  * stratified sample through this before paying for the full board.
  * Unknown names fail fast (a typo must not silently shrink the sample).
  *
  * `runMain graft.DevPasses <dir> <passes> [q1,q2,...]` */
object DevPasses {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val subset = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    subset.foreach { s =>
      val unknown = s -- Queries.all.keySet
      require(unknown.isEmpty, s"unknown queries in subset: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val ordered = Queries.all.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    val quarter = (ordered.size + 3) / 4
    (1 to passes).foreach { p =>
      val per = ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        graft.operators.Checkpoints.release(spark)
        name -> (System.nanoTime() - t0) / 1e9
      }
      val qs = per.grouped(quarter).map(_.map(_._2).sum).toSeq
      println(f"[pass $p] wall ${per.map(_._2).sum}%7.1f s  quarters ${qs.map(q => f"$q%6.1f").mkString(" ")}")
      val top = per.sortBy(-_._2).take(5)
        .map { case (n, t) => f"$n=$t%.1f" }.mkString(" ")
      println(s"[pass $p] top5 $top")
    }
    spark.stop()
  }
}
