package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the scale studies (not shipped): default mode dumps
  * the intermediate cardinalities of the LSH audit pipeline at a fixture
  * dir (bucket histogram, candidate pairs, shingle rows, join fan-out —
  * the numbers behind SCALING.md's quadratic-candidate adjudications);
  * `plan <query>` prints a query's formatted physical plan; `semdiag`
  * prints the adaptive-k SemDeDup cluster-size histogram (the skew
  * evidence behind the triangular blocked self-join). */
object DevDiag {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (args.length > 1 && args(1) == "plan") {
      Queries.all(args(2))(spark, d).explain("formatted")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "semdiag") {
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      val k = math.max(8L, n / 2500L).toInt
      println(s"[semdiag] n=$n k=$k")
      val cents = operators.Similarity.seedCentroids(emb, "vec_id", "embedding", k)
      val assigned = operators.Similarity
        .kmeansAssignJoined(emb, "vec_id", "embedding", cents)
      assigned.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .orderBy(desc("sz")).show(15, false)
      spark.stop(); return
    }
    val docs = Tables.documents(spark, d)
    val sig = operators.TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    sig.persist()
    println(s"[diag] docs=${docs.count()} sigs=${sig.count()}")
    val buckets = operators.TextOps
      .lshOversizedBuckets(sig, "doc_id", 4, maxBucket = 0) // all buckets
    val hist = buckets
      .withColumn("bucket_pow2", pow(lit(2), floor(log2(col("n")))).cast("long"))
      .groupBy("bucket_pow2")
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("members"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs_if_expanded"))
      .orderBy("bucket_pow2")
    hist.show(50, false)
    val est = operators.TextOps.minhashEstimatedJaccard(sig, "doc_id", 4)
    est.persist()
    println(s"[diag] est_pairs=${est.count()}")
    val cand = est.select(col("id_a").as("doc_id"))
      .union(est.select(col("id_b").as("doc_id"))).distinct()
    println(s"[diag] cand_docs=${cand.count()}")
    val shAll = operators.TextOps.explodedShingles(docs, "doc_id", "text", 3).distinct()
    println(s"[diag] distinct_shingle_rows_full=${shAll.count()}")
    val shC = operators.TextOps.explodedShingles(
      docs.join(cand, Seq("doc_id"), "left_semi"), "doc_id", "text", 3).distinct()
    println(s"[diag] distinct_shingle_rows_cand=${shC.count()}")
    // the fan-out of the exact-verify join: per-doc pair-degree x shingles
    val degA = est.groupBy("id_a").agg(count(lit(1)).as("deg"))
    val degStats = degA.agg(max("deg").as("max_deg"), avg("deg").as("avg_deg"))
    degStats.show(false)
    val shSz = shC.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val joinRows = est.select(col("id_a").as("doc_id"))
      .join(shSz, "doc_id").agg(sum("sz")).collect()(0)
    println(s"[diag] interA_join_rows=$joinRows")
    spark.stop()
  }
}
