package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.operators.{Ops, TextOps, TrainPrep}

/** The full training-data curation pipeline, composed end-to-end from the
  * library's operators — the program a user of the reference pipeline
  * would actually run to turn a raw document corpus into packed,
  * leakage-safe training shards:
  *
  *   quality gate → language ID → exact dedup (fingerprint first-wins) →
  *   near-dup survivorship (MinHash-LSH cluster fixpoint, keep canonical)
  *   → exact-substring drop → cluster-inherited train/val/test split →
  *   sequence packing → (split, lang) manifest
  *
  * Every stage is ONE declarative call into the library; the composition
  * stays a single lazy Catalyst program until the manifest materializes.
  * Stage semantics (and their 100-TB postures) are the ones the oracle
  * board checks one-by-one: q_quality_filter, q_lang_id, q_exact_dedup,
  * q_minhash_dedup_map/q_leakage_split, q_substring_dedup, q_train_split,
  * and the packing tier. `runMain graft.examples.CurationPipelineDemo` */
object CurationPipelineDemo {

  /** Run the pipeline over `sfDir`'s documents; returns the per-(split,
    * lang) manifest and the per-stage surviving-document counts. */
  def run(spark: SparkSession, sfDir: String): (DataFrame, Seq[(String, Long)]) = {
    val docs = Tables.documents(spark, sfDir)
    val stages = Seq.newBuilder[(String, Long)]
    stages += "raw" -> docs.count()

    // 1. quality gate: native single-sweep text stats; drop degenerate docs
    val quality = TextOps.qualityScore(docs, "doc_id", "text",
        Seq("the", "and", "of", "to", "is", "a"))
      .where(col("n_tokens") >= 5)
      .select("doc_id", "n_tokens")
    val gated = docs.join(quality, "doc_id")
    stages += "quality_gate" -> gated.count()

    // 2. language ID (zero-shuffle native expression)
    val tagged = TextOps.langIdNative(gated, "doc_id", "text")
      .join(gated, "doc_id")

    // 3. exact dedup: whole-doc fingerprint, lowest doc_id survives
    val exact = Ops.dedupFirstWins(
      tagged.withColumn("fp", TextOps.fingerprint(col("text"))),
      Seq("fp"), Seq(col("doc_id")))
    stages += "exact_dedup" -> exact.count()

    // 4. near-dup survivorship: MinHash-LSH cluster fixpoint, keep each
    //    cluster's canonical (docs too short to shingle pass through)
    val sig = TextOps.minhashSignatureMd5(exact, "doc_id", "text", 3, 4)
    val clusters = TextOps.lshDedupClusters(sig, "doc_id", 4)
      .withColumnRenamed("id", "doc_id")
    val survivors = exact.join(clusters, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
      .where(col("doc_id") === col("canonical_id"))
    stages += "neardup_survivors" -> survivors.count()

    // 5. exact-substring curation: drop docs that are mostly verbatim spans
    //    of other docs (trim accounting kept in the manifest)
    val spans = TextOps.substringDedup(
      survivors.select("doc_id", "text"), "doc_id", "text", 5)
    val kept = survivors
      .join(spans.where(col("action") =!= "drop")
        .select("doc_id", "kept_tokens"), "doc_id")
    stages += "substring_kept" -> kept.count()

    // 6. leakage-safe split: survivors are cluster canonicals, so hashing
    //    the canonical key IS the cluster-inherited split
    val bucket =
      expr("((canonical_id % 2147483648) * 2654435761) % 4294967296 % 10")
    val split = kept.withColumn("split",
      when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))

    // 7. pack into 512-token shards PER SPLIT (a pack must never mix
    //    train and eval); each split runs the two-phase prefix sum — the
    //    split enum is bounded, so this is 3 plans, not a per-key loop
    val packed = Seq("train", "val", "test").map { sp =>
      TrainPrep.packSequences(
        split.where(col("split") === sp)
          .select("doc_id", "split", "lang_pred", "kept_tokens"),
        "doc_id", "kept_tokens", 512)
    }.reduce(_ unionByName _)

    // 8. manifest: the dataset card a training run consumes
    val manifest = packed.groupBy("split", "lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum("kept_tokens").as("n_tokens"),
        countDistinct(col("pack_id")).as("n_packs"))
      .orderBy("split", "lang_pred")
    (manifest, stages.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val (manifest, stages) = run(spark, sfDir)
    stages.foreach { case (s, n) => println(f"[curate] $s%-18s $n%7d docs") }
    println("[curate] manifest:")
    manifest.show(50, truncate = false)
    spark.stop()
  }
}
