package graft

/** Dev micro-benchmark twin of [[DevMicro]] on a BARE default session (no
  * extensions, no graft confs) to isolate which session ingredient pays
  * the per-job latency floor. `runMain graft.DevMicroBare [reps]` */
object DevMicroBare {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("bare").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[micro] $name%-34s min ${ts.head}%8.1f ms  med ${ts(reps / 2)}%8.1f ms")
    }
    time("empty job (range(1).count)") { spark.range(1).count() }
    time("rdd-only job (parallelize.count)") {
      spark.sparkContext.parallelize(1 to 10, 1).count()
    }
    val planned = spark.range(1).selectExpr("count(*) AS c")
    planned.collect() // plan once + warm
    time("pre-planned collect (same QE)") { planned.collect() }
    time("fresh plan + collect") {
      spark.range(1).selectExpr("count(*) AS c").collect()
    }
    time("planning only (executedPlan)") {
      spark.range(1).selectExpr("count(*) AS c")
        .queryExecution.executedPlan
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("fresh collect, codegen OFF") {
      spark.range(1).selectExpr("count(*) AS c").collect()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("fresh collect, AQE OFF") {
      spark.range(1).selectExpr("count(*) AS c").collect()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("fresh collect, AQE+codegen OFF") {
      spark.range(1).selectExpr("count(*) AS c").collect()
    }
    spark.stop()
  }
}
