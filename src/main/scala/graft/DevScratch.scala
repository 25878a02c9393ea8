package graft

/** Throwaway inspection main — rotated per investigation, not part of the
  * library surface. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val df = Queries.all("q_tfidf")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(p).size)
    println("Scan parquet count: " + "Scan parquet".r.findAllIn(p).size)
    spark.stop()
  }
}
