package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata. At 100 TB the `content`
  * column dominates — keep it in its own parquet column chunk (columnar
  * pruning means metadata-only queries never touch the bytes) and
  * partition/cluster by `kind` so per-modality pipelines prune at scan. */
case class MediaAsset(media_id: Long, kind: String, format: String,
                      content: Array[Byte], width: Int, height: Int,
                      sample_rate: Int, duration_ms: Long)

/** Decoded per-asset features (the output contract of the decode stage). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         mean_byte: Double, feature: Array[Float])

/** One sampled video frame descriptor. */
case class FrameSample(media_id: Long, frame_idx: Long, offset_ms: Long,
                       frame_hash: Long)

/** Multimodal-column operators: images/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition through the
  * Dataset API (the Scala analog of `mapInPandas` — one iterator per
  * partition, so a real codec amortizes model/codec init across the
  * partition, exactly like a pandas batch).
  *
  * The DECODE ITSELF IS A STUB — this container has no image/audio codecs,
  * so `decodeBytes` derives deterministic pseudo-features from the raw
  * bytes. Every seam a real implementation needs — schema, encoders,
  * partition-iterator shape, per-partition init hook, feature vector
  * column feeding [[Similarity]] — is real and tested; swap `decodeBytes`
  * for an actual codec call and nothing else changes. */
object Multimodal {

  val FEATURE_DIM = 16

  /** STUB decode: deterministic pseudo-features from raw bytes (stands in
    * for JPEG/PNG/PCM decoding — no codecs in this environment). */
  private[operators] def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FEATURE_DIM)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      f(i % FEATURE_DIM) += (b / 255.0f)
      i += 1
    }
    var d = 0
    while (d < FEATURE_DIM) { f(d) = f(d) / math.max(1, bytes.length / FEATURE_DIM); d += 1 }
    f
  }

  /** Decode/feature-extract stage: per-partition iterator over assets →
    * features. The `iter =>` prologue is where a real pipeline loads its
    * codec/model once per partition (NOT per row). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { iter =>
      // per-partition init hook: e.g. codecPool.acquire() for a real codec
      iter.map { a =>
        val bytes = if (a.content == null) Array.emptyByteArray else a.content
        val feat = decodeBytes(bytes)
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        MediaFeatures(a.media_id, a.kind, bytes.length.toLong,
          math.rint(mean * 100) / 100, feat)
      }
    }
  }

  /** Frame sampling for video assets: every `everyMs` milliseconds of the
    * declared duration, one frame descriptor. Emitted via flatMap — output
    * cardinality is data-dependent, the shape a real demuxer has. The
    * frame_hash stands in for the decoded frame bytes' digest. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = math.max(1L, a.duration_ms / everyMs)
      (0L until n).iterator.map { i =>
        val off = i * everyMs
        // STUB: real impl seeks+decodes the frame; hash of (id, offset) here
        val h = java.util.Arrays.hashCode(Array(a.media_id, off)).toLong
        FrameSample(a.media_id, i, off, h)
      }
    }
  }

  /** Resize stage for image assets: new dimensions in the metadata, content
    * re-derived (STUB: a real impl decodes, scales, re-encodes; here the
    * bytes are deterministically resampled to the scaled length so the
    * content column's size tracks the transform). Non-images pass through
    * untouched — the per-modality branch a mixed corpus needs. */
  def resizeImages(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { iter =>
      iter.map { a =>
        if (a.kind != "image" || a.width <= maxW && a.height <= maxH) a
        else {
          val scale = math.min(maxW.toDouble / a.width, maxH.toDouble / a.height)
          val w = math.max(1, (a.width * scale).toInt)
          val h = math.max(1, (a.height * scale).toInt)
          val src = if (a.content == null) Array.emptyByteArray else a.content
          // STUB resample: length scales with area ratio; bytes taken at a
          // deterministic stride (stands in for decode→scale→re-encode).
          // Empty/null content stays empty — only the metadata scales.
          val out = if (src.isEmpty) src else {
            val outLen = math.max(1, (src.length * scale * scale).toInt)
            val o = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) { o(i) = src((i.toLong * src.length / outLen).toInt); i += 1 }
            o
          }
          a.copy(content = out, width = w, height = h)
        }
      }
    }
  }

  /** Metadata-only projection — must never read the `content` column chunk
    * (verified in the spec via the physical plan's ReadSchema, and on the
    * driver board by q_media_summary's oracle + plan pin). Integer-exact
    * outputs only (count + sum): a `round(avg(...), 2)` here would flip
    * engines on .xx5 boundaries — present averages with the roundDiv
    * discipline downstream if needed. */
  def metadataSummary(media: DataFrame): DataFrame =
    media.groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
        sum(col("duration_ms")).as("total_duration_ms"))

  /** Declarative frame-sampling SCHEDULE over a media metadata frame: for
    * each video, one row per frame to sample — every `everyMs` of the
    * declared duration, at most `maxFrames` per asset (at least one). This
    * is the PLANNING half of [[sampleFrames]] as a pure relational map
    * stage (sequence + explode, row-local at any scale): at 100 TB the
    * schedule is computed from metadata alone — the binary `content`
    * column is never touched — then joined back to the bytes only for the
    * frames actually decoded. `frame_hash` is the portable md5 of
    * (media_id, offset_ms), standing in for the decoded frame digest so
    * the schedule is oracle-checkable cross-engine. */
  def frameSchedule(media: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        explode(expr(
          s"sequence(0L, least(greatest(duration_ms div ${everyMs}L, 1L), ${maxFrames}L) - 1)"))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * lit(everyMs)).as("offset_ms"),
        expr(s"CAST(conv(substr(md5(concat_ws('|', media_id, frame_idx * ${everyMs}L)), " +
          "1, 15), 16, 10) AS BIGINT)").as("frame_hash"))

  /** Deterministic synthetic media corpus for tests/demos (no fixture table
    * carries binary content). Bytes are seeded per id — stable across runs,
    * generated distributedly (one range partition per slice, no driver
    * materialization). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Seq("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val rnd = new java.util.Random(id * 2654435761L)
      val len = 64 + rnd.nextInt(192)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      MediaAsset(id, kind,
        if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
        bytes,
        if (kind == "image") 640 else 0,
        if (kind == "image") 480 else 0,
        if (kind == "audio") 16000 else 0,
        if (kind == "video") 4000L + (id % 7) * 1000 else 0L)
    }
  }
}
