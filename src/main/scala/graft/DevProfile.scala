package graft

/** Dev profiler: time one query repeatedly, then break the LAST rep down
  * per job (wall, stage count, task count, description) — the localizer
  * for "which of this query's jobs carry the wall".
  *
  * `runMain graft.DevProfile <name> [sf] [reps]` */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val fn = Queries.all(name)
    case class JobRec(id: Int, start: Long, var end: Long = 0L,
                      var stages: Int = 0, var tasks: Int = 0,
                      desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, js.time,
          stages = js.stageInfos.size,
          tasks = js.stageInfos.map(_.numTasks).sum, desc = d.take(70)))
        order.add(js.jobId)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
    })
    for (i <- 1 to reps) {
      Thread.sleep(300) // let the async listener bus drain the prior rep's events
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val recs = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      println(f"[profile] $name rep$i: $dt%.2f s, jobs=${recs.size}, " +
        f"stages=${recs.map(_.stages).sum}, tasks=${recs.map(_.tasks).sum}")
      if (i == reps) {
        var prevEnd = 0L
        recs.foreach { r =>
          val gap = if (prevEnd == 0) 0.0 else (r.start - prevEnd) / 1e3
          prevEnd = r.end
          println(f"[job] id=${r.id}%4d wall=${(r.end - r.start) / 1e3}%7.3f s " +
            f"gap=$gap%7.3f s stages=${r.stages}%2d tasks=${r.tasks}%4d ${r.desc}")
        }
      }
    }
    val df = fn(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val ep = df.queryExecution.executedPlan.toString
    println("[profile] reused stages: " +
      "ReusedQueryStage|ReusedExchange|StageReuse".r.findAllIn(ep).toList
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.mkString(", "))
    spark.stop()
  }
}
