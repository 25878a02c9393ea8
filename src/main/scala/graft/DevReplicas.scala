package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared replica builder for the scale-up dev studies ([[DevScaling]],
  * [[DevCkptTier]]): replicates the fact tables of an existing fixture N×
  * (key-offset so join integrity holds: same customer universe, N× the
  * orders/lineitems/events per key — organic growth shape) into /tmp and
  * returns the replica dir. Idempotent via a `_SUCCESS` sentinel. */
object DevReplicas {
  val Offset = 1000000000L

  def ensure(spark: SparkSession, src: String, reps: Int): String = {
    val dst = s"/tmp/graft_scaled_${reps}x"
    def replicate(table: String, keyCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      (0 until reps).map { i =>
        keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Offset)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    def copy(table: String): Unit =
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")

    // _SUCCESS sentinel, not directory existence: a crashed half-build must
    // rebuild, never silently benchmark incomplete data
    val sentinel = java.nio.file.Paths.get(dst, "_SUCCESS")
    if (!java.nio.file.Files.exists(sentinel)) {
      replicate("lineitem", Seq("l_orderkey"))
      replicate("orders", Seq("o_orderkey"))
      replicate("events", Seq("event_id"))
      // documents/embeddings replicate too (identical payloads under new
      // ids — the worst case for dedup ops: every bucket grows reps×);
      // callers must pick LINEAR/bounded-output doc queries only
      replicate("documents", Seq("doc_id"))
      replicate("embeddings", Seq("vec_id"))
      Seq("customer", "nation", "region", "supplier", "part").foreach(copy)
      java.nio.file.Files.createFile(sentinel)
      println(s"[scaling] built $dst (${reps}x facts)")
    }
    dst
  }
}
