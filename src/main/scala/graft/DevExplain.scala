package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for named queries into a
  * directory (one `<query>_<tag>.txt` per query) — the evidence trail the
  * optimization rounds commit under `plans/rNN/`.
  *
  * `runMain graft.DevExplain <dir> <outDir> <tag> <q1,q2,...|all>` */
object DevExplain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: DevExplain <dir> <outDir> <tag> <q1,q2,...|all>")
    val dir = args(0)
    val outDir = Paths.get(args(1))
    val tag = args(2)
    val names =
      if (args(3) == "all") Queries.all.keys.toSeq.sorted
      else args(3).split(",").toSeq
    val unknown = names.filterNot(Queries.all.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    Files.createDirectories(outDir)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { name =>
      val plan =
        try Queries.all(name)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.write(outDir.resolve(s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"[explain] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
