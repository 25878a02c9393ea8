package graft
/** Dev profiler: time one query repeatedly. `runMain graft.DevProfile <name> [sf] [reps]` */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val fn = Queries.all(name)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (i <- 1 to reps) {
      Thread.sleep(200) // let the async listener bus drain the prior rep's events
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[profile] $name rep$i: $dt%.2f s, jobs=${jobs.get() - j0}")
    }
    val df = fn(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val ep = df.queryExecution.executedPlan.toString
    println("[profile] reused stages: " + "ReusedQueryStage|ReusedExchange|StageReuse".r.findAllIn(ep).toList.groupBy(identity).map{case(k,v)=>s"$k x${v.size}"}.mkString(", "))
    spark.stop()
  }
}
