package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a FULL-DIMENSION scaled fixture — the sf1 (and beyond)
  * evidence the ≤ sf0.1 driver fixtures can't provide.
  *
  * Unlike [[DevScaling]] (organic-growth shape: fixed dims, N× facts —
  * right for per-operator ratio studies), this produces a dataset shaped
  * like a genuinely larger scale factor: every entity is replicated N×
  * with replica-i keys offset by `i·OFFSET`, referential integrity
  * preserved edge-for-edge (orders→customer, lineitem→{orders, part,
  * supplier}, events→user all re-keyed consistently), and payloads varied
  * so the data stays semantically well-behaved at scale:
  *
  *  - `c_name`/`s_name` are regenerated from the NEW key (fixture format
  *    `Customer#%09d`) so name-keyed ops (fuzzy-match deletion blocks)
  *    see N× distinct names, not N identical copies of each name;
  *  - `documents.text` gets a per-replica suffix (` v<i>`, i>0) with
  *    `n_chars` recomputed, so exact-dedup clusters stay bounded (≤ N×
  *    original cluster size) instead of every doc becoming an N-way
  *    identical-payload dup — replicas are NEAR-dups (one trailing token),
  *    which is the realistic shape for near-dup ops at scale;
  *  - `embeddings.embedding[0]` is perturbed by `i·0.01` (materialized
  *    into the parquet, so Spark and the DuckDB oracle read identical
  *    floats — no cross-engine drift) to break the cosine ties exact
  *    replicas would create in top-k orderings;
  *  - `events.ts` is normalized to µs `TimestampType` on the way through
  *    ([[Tables.events]]), so the scaled fixture is readable by the DuckDB
  *    oracle as TIMESTAMP regardless of the source fixture's encoding.
  *
  * Replica 0 is the identity (offset 0), so literal-key references in
  * queries (BFS seeds, snapshot dates) remain valid.
  *
  * `runMain graft.DevSfGen [srcDir] [dstDir] [reps]`
  * (defaults: sf0.1 → /tmp/graft_sf1, 10× ⇒ ≈ sf1: 6 M lineitem,
  * 150 k customer, 1 M events, 50 k docs.)
  */
object DevSfGen {
  val OFFSET = 1000000000L

  def build(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    val sentinel = java.nio.file.Paths.get(dst, "_SUCCESS")
    if (java.nio.file.Files.exists(sentinel)) {
      println(s"[sfgen] $dst already built"); return
    }

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(i => f(df, i)).reduce(_ unionByName _)

    def offs(c: String, i: Int) = col(c) + lit(i.toLong * OFFSET)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[sfgen] wrote $name")
    }

    write(replicas(Tables.customer(spark, src)) { (df, i) =>
      df.withColumn("c_custkey", offs("c_custkey", i))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }, "customer")

    write(replicas(Tables.supplier(spark, src)) { (df, i) =>
      df.withColumn("s_suppkey", offs("s_suppkey", i))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
    }, "supplier")

    write(replicas(Tables.part(spark, src)) { (df, i) =>
      df.withColumn("p_partkey", offs("p_partkey", i))
    }, "part")

    write(replicas(Tables.orders(spark, src)) { (df, i) =>
      df.withColumn("o_orderkey", offs("o_orderkey", i))
        .withColumn("o_custkey", offs("o_custkey", i))
    }, "orders")

    write(replicas(Tables.lineitem(spark, src)) { (df, i) =>
      df.withColumn("l_orderkey", offs("l_orderkey", i))
        .withColumn("l_partkey", offs("l_partkey", i))
        .withColumn("l_suppkey", offs("l_suppkey", i))
    }, "lineitem")

    write(replicas(Tables.events(spark, src)) { (df, i) =>
      df.withColumn("event_id", offs("event_id", i))
        .withColumn("user_id", offs("user_id", i))
    }, "events")

    write(replicas(Tables.documents(spark, src)) { (df, i) =>
      val suffixed =
        if (i == 0) df
        else df.withColumn("text", concat(col("text"), lit(s" v$i")))
      suffixed.withColumn("doc_id", offs("doc_id", i))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    write(replicas(Tables.embeddings(spark, src)) { (df, i) =>
      val perturbed =
        if (i == 0) df
        else df.withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> CAST(CASE WHEN j = 0 THEN x + ${i * 0.01} ELSE x END AS FLOAT))"))
      perturbed.withColumn("vec_id", offs("vec_id", i))
    }, "embeddings")

    Seq("nation", "region").foreach { t =>
      write(Tables.table(spark, src, t), t)
    }

    java.nio.file.Files.createFile(sentinel)
    println(s"[sfgen] built $dst (${reps}x all entities, full-dimension)")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    build(spark, src, dst, reps)
    Tables.entityNames.foreach { t =>
      println(f"[sfgen] $t%-12s ${spark.read.parquet(s"$dst/$t.parquet").count()}%10d rows")
    }
    spark.stop()
  }
}
