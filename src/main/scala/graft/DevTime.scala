package graft

/** Dev tool: min-of-2 warm noop-sink timing of named queries against an
  * arbitrary fixture dir — the quiet-JVM adjudication primitive
  * ([[DevScaling]]'s `time` loop without the fixed-dim replica build), for
  * full-dimension comparisons (e.g. sf0.1 vs the [[DevSfGen]] sf1 build)
  * where the fixed-dim organic-growth shape would be the wrong model.
  * An optional third argument raises the rep count (min-of-N) for
  * single-query dispositions that need more power than min-of-2.
  *
  * `runMain graft.DevTime <dir> <q1,q2,...> [reps]` */
object DevTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DevTime <dir> <q1,q2,...> [reps]")
    val dir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 2
    val (names, unknown) = args(1).split(",").toSeq.partition(Queries.all.contains)
    require(unknown.isEmpty,
      s"unknown queries (not in Queries.all): ${unknown.mkString(", ")}")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { name =>
      val fn = Queries.all(name)
      fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[time] $name%-24s $dir $t%8.2f s")
    }
    spark.stop()
  }
}
