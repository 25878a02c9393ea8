package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ops, TextOps}

/** Throwaway stage-by-stage profiler for the minhash pipeline. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(label: String)(df: => DataFrame): Unit = {
      // warmup + 2 timed
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-28s min=${ts.min}%.3f s")
    }

    val docs = Tables.documents(spark, sf)
    time("docs_scan")(docs)
    time("normalize_split")(docs.select(col("doc_id"),
      explode(split(Ops.normalizeText(col("text")), " ")).as("token")))
    time("tokenize_posexplode")(TextOps.tokenize(docs, Ops.normalizeText(col("text")), Seq(col("doc_id"))))
    time("exploded_shingles")(TextOps.explodedShingles(docs, "doc_id", "text", 3))
    time("shingles_md5x1")(TextOps.explodedShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), md5(col("shingle")).as("h")))
    time("minhash_sig_md5x4")(TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4))
    time("lsh_pairs_full")(Queries.qMinhashDedup(spark, sf))
    time("simhash64")(TextOps.simhash64(docs, "doc_id", "text"))
    time("simhash64_agg")(TextOps.simhash64Agg(docs, "doc_id", "text"))
    time("q_ann_ivf")(Queries.all("q_ann_ivf")(spark, sf))
    time("q_entity_counts")(Queries.all("q_entity_counts")(spark, sf))
    spark.stop()
  }
}
