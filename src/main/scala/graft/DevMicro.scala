package graft

import org.apache.spark.sql.functions._

/** Dev micro-benchmark: size the per-job / per-stage / per-checkpoint
  * latency floor that multiplies through every query at bench scale —
  * the denominator for "is this query's wall algorithmic or harness?".
  *
  * `runMain graft.DevMicro [reps]` */
object DevMicro {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[micro] $name%-34s min ${ts.head}%8.1f ms  med ${ts(reps / 2)}%8.1f ms")
    }
    time("empty job (range(1).count)") { spark.range(1).count() }
    time("32-task job (range 1e6, 32 part)") {
      spark.range(0, 1000000, 1, 32).select(sum($"id")).head
    }
    time("1-exchange agg (1e6 rows)") {
      spark.range(0, 1000000, 1, 32).groupBy(($"id" % 100).as("k"))
        .agg(count(lit(1))).write.mode("overwrite").format("noop").save()
    }
    time("1-exchange agg (1e6 rows, 1 part)") {
      spark.range(0, 1000000, 1, 1).groupBy(($"id" % 100).as("k"))
        .agg(count(lit(1))).write.mode("overwrite").format("noop").save()
    }
    time("1-exchange agg (100 rows, 1 part)") {
      spark.range(0, 100, 1, 1).groupBy(($"id" % 10).as("k"))
        .agg(count(lit(1))).write.mode("overwrite").format("noop").save()
    }
    time("2-exchange agg+join (1e6 rows)") {
      val a = spark.range(0, 1000000, 1, 32).groupBy(($"id" % 100).as("k"))
        .agg(count(lit(1)).as("c"))
      a.join(a.withColumnRenamed("c", "c2"), "k")
        .write.mode("overwrite").format("noop").save()
    }
    time("localCheckpoint (100-row frame)") {
      val df = spark.range(100).toDF("n").localCheckpoint()
      df.unpersist()
    }
    time("localCheckpoint post-shuffle") {
      val df = spark.range(0, 100000, 1, 32).groupBy(($"id" % 1000).as("k"))
        .agg(count(lit(1)).as("c")).localCheckpoint()
      df.unpersist()
    }
    time("observe+localCheckpoint") {
      val obs = org.apache.spark.sql.Observation()
      val df = spark.range(0, 100000, 1, 32).groupBy(($"id" % 1000).as("k"))
        .agg(count(lit(1)).as("c"))
        .observe(obs, max($"c").as("m")).localCheckpoint()
      obs.get
      df.unpersist()
    }
    time("parquet scan noop (lineitem sf0.1)") {
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
