package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 90)

  test("synthetic corpus is deterministic and kind-balanced") {
    val a = media.collect().map(m => (m.media_id, m.content.toSeq))
    val b = Multimodal.syntheticMedia(spark, 90).collect().map(m => (m.media_id, m.content.toSeq))
    assert(a.toSeq == b.toSeq)
    val kinds = media.groupByKey(_.kind).count().collect().toMap
    assert(kinds == Map("image" -> 30L, "audio" -> 30L, "video" -> 30L))
  }

  test("extractFeatures: schema, determinism, and full coverage") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "n_bytes", "mean_byte", "feature"))
    val rows = feats.collect()
    assert(rows.length == 90)
    assert(rows.forall(_.feature.length == Multimodal.FEATURE_DIM))
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("feature vectors feed the similarity tier end-to-end") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val probe = feats.where($"media_id" === 0)
      .select("feature").as[Array[Float]].head()
    val topk = Similarity.cosineTopK(
      feats.where($"media_id" =!= 0), "media_id", "feature", probe, 5)
    assert(topk.count() == 5)
    val sims = topk.select("sim").as[Double].collect()
    assert(sims.toSeq == sims.sorted(Ordering[Double].reverse).toSeq)
  }

  test("resizeImages: images scaled within bounds, aspect kept, others untouched") {
    val resized = Multimodal.resizeImages(media, 320, 240).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { m =>
      val o = orig(m.media_id)
      if (o.kind == "image") {
        assert(m.width <= 320 && m.height <= 240)
        // 640x480 → 320x240 keeps the 4:3 aspect
        assert(m.width * o.height == m.height * o.width)
        assert(m.content.length < o.content.length)
      } else {
        assert(m.content.toSeq == o.content.toSeq && m.width == o.width)
      }
    }
    // deterministic across runs
    val again = Multimodal.resizeImages(media, 320, 240).collect()
    assert(resized.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)
  }

  test("resizeImages survives null/empty content on an oversized image") {
    val assets = Seq(
      graft.operators.MediaAsset(1L, "image", "png", null, 640, 480, 0, 0L),
      graft.operators.MediaAsset(2L, "image", "png", Array.emptyByteArray, 640, 480, 0, 0L))
      .toDS()
    val out = Multimodal.resizeImages(assets, 320, 240).collect().sortBy(_.media_id)
    assert(out.forall(m => m.width == 320 && m.height == 240))
    assert(out.forall(m => m.content == null || m.content.isEmpty))
  }

  test("sampleFrames: only videos, correct count per declared duration") {
    val frames = Multimodal.sampleFrames(media, 1000L)
    val byId = frames.groupByKey(_.media_id).count().collect().toMap
    val videos = media.filter(_.kind == "video").collect()
    assert(byId.keySet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      assert(byId(v.media_id) == math.max(1L, v.duration_ms / 1000L), s"video ${v.media_id}")
    }
  }

  test("metadata summary never reads the content column (columnar pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.toDF().write.mode("overwrite").parquet(dir)
    val summary = Multimodal.metadataSummary(spark.read.parquet(dir))
    val plan = summary.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("content"), "content column must be pruned from the scan:\n" + plan)
    assert(summary.count() == 3)
  }

  test("frameSchedule: videos only, cap honored, offsets on the grid, count matches sampleFrames under the cap") {
    val sched = Multimodal.frameSchedule(media.toDF(), 1000L, 8).collect()
    val videos = media.filter(_.kind == "video").collect()
    val byId = sched.groupBy(_.getLong(0))
    assert(byId.keySet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      val expect = math.min(math.max(1L, v.duration_ms / 1000L), 8L)
      val rows = byId(v.media_id).sortBy(_.getLong(1))
      assert(rows.length.toLong == expect, s"video ${v.media_id}")
      // frame_idx contiguous from 0; offsets on the everyMs grid
      assert(rows.map(_.getLong(1)).toSeq == (0L until expect))
      assert(rows.forall(r => r.getLong(2) == r.getLong(1) * 1000L))
      // under the cap the schedule and the typed flatMap sampler agree
      if (v.duration_ms / 1000L <= 8L)
        assert(expect == math.max(1L, v.duration_ms / 1000L))
    }
  }

  test("partition-iterator shape: features computed with the input's partitioning") {
    val reparted = media.repartition(7)
    val feats = Multimodal.extractFeatures(reparted)
    assert(feats.rdd.getNumPartitions == 7)
    assert(feats.count() == 90)
  }
}
