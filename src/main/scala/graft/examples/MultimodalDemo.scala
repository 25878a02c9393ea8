package graft.examples

import graft.Sessions
import graft.operators.{Multimodal, Similarity}

/** Multimodal pipeline demo: synthetic binary corpus → parquet → metadata-only
  * scan (content pruned) → per-partition decode → similarity search.
  * `runMain graft.examples.MultimodalDemo` */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_media_demo").toString
    Multimodal.syntheticMedia(spark, 120).toDF()
      .write.mode("overwrite").partitionBy("kind").parquet(dir)
    val media = spark.read.parquet(dir)
    println("[demo] metadata summary (content column pruned from scan):")
    Multimodal.metadataSummary(media).orderBy("kind").show(truncate = false)
    val feats = Multimodal.extractFeatures(media.as[graft.operators.MediaAsset]).toDF()
    val probe = feats.where($"media_id" === 0).select("feature").as[Array[Float]].head()
    println("[demo] top-5 nearest assets to media_id=0 by decoded-feature cosine:")
    Similarity.cosineTopK(feats.where($"media_id" =!= 0), "media_id", "feature", probe, 5)
      .show(truncate = false)
    println("[demo] frames sampled: " +
      Multimodal.sampleFrames(media.as[graft.operators.MediaAsset], 1000L).count())
    spark.stop()
  }
}
