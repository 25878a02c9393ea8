package graft

import java.nio.file.{Files, Paths}

/** Throwaway inspection main — rotated per investigation, not part of the
  * library surface. Current use: dump ONLY the named queries (args after
  * the first two) for a fast dev/check.py loop on new declarations. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scratch"
    val names = if (args.length > 2) args.drop(2).toSeq else Queries.all.keys.toSeq
    val spark = Sessions.local("8")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      Queries.all(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = Queries.oracles.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
