package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    // noop sink forces full computation of every column (count() would let
    // Catalyst prune the projections and under-measure). A query that
    // crashes is recorded in `errors` — never silently scored as a
    // near-zero time.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run(name: String,
            fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        false
      }
    // Untimed warmup pass: JIT-compile the scan/codegen/shuffle paths once so
    // the timed passes measure steady-state engine throughput, not
    // first-touch JVM compilation (rep1 vs rep2 differs ~10× on this JVM).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) => run(name, fn) }
    // Two timed passes, per-query minimum: the min is the standard estimator
    // of steady-state cost under one-sided scheduler/GC noise. Failed
    // queries score NaN (JSON null) so the totals can't look healthy.
    def timedPass(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = run(name, fn)
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
      }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    def jnum(v: Double): String = if (v.isNaN) "null" else v.toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.values.filterNot(_.isNaN).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
