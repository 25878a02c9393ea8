package graft

/** Dev: tight fresh-plan collect loop for stack sampling. */
object DevMicroLoop {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("bare").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(600)
    val t0 = System.nanoTime()
    (1 to n).foreach { _ =>
      spark.range(1).selectExpr("count(*) AS c").collect()
    }
    println(f"[loop] $n fresh collects in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
