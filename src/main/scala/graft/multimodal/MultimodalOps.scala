package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) as opaque BINARY columns + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages as
  * partition-wise Dataset transforms.
  *
  * The DECODERS ARE STUBS (this container has no image/audio codecs):
  * they derive deterministic fake dimensions/features from the bytes.
  * Everything around them is the real thing — schema contracts,
  * mapPartitions batch shape (one decoder init per partition, not per
  * row — the same reason Python pipelines use mapInPandas), and
  * partition sizing so a 100 TB media corpus streams through without
  * materializing rows in memory.
  */
object MultimodalOps {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], source: String)
  case class DecodedMedia(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int, source: String)
  case class MediaFeatures(media_id: Long, embedding: Array[Float])

  /** Deterministic synthetic media table derived from `documents`
    * (text bytes standing in for encoded media) — fixture for the
    * plumbing until real corpora arrive.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        col("source"))
      .as[MediaRow]
  }

  /** STUB decode: dimensions/frame-count derived from byte content.
    * A real deployment swaps `decodeOne` for a codec call; the
    * mapPartitions shape (decoder state initialized once per
    * partition) and the output schema stay identical.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles etc.)
      rows.map(decodeOne)
    }
  }

  private def decodeOne(m: MediaRow): DecodedMedia = {
    // ??? real codec — STUB: deterministic pseudo-dimensions
    val h = graft.functions.TextHash.fnv1a(m.bytes, 0, m.bytes.length)
    val width = 64 + math.floorMod(h, 1024L).toInt
    val height = 64 + math.floorMod(h >>> 20, 1024L).toInt
    val frames = m.kind match {
      case "video" => 1 + math.floorMod(h >>> 40, 300L).toInt
      case _       => 1
    }
    DecodedMedia(m.media_id, m.kind, width, height, frames, m.bytes.length, m.source)
  }

  /** STUB feature extraction: BINARY -> ARRAY<FLOAT> embedding
    * (hash-fold), feeding the similarity-search operators
    * (graft.sim). Batch shape identical to a real encoder.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < m.bytes.length) {
          val j = i % dim
          v(j) = v(j) + (m.bytes(i) & 0xff) / 255.0f
          i += 1
        }
        MediaFeatures(m.media_id, v)
      }
    }
  }

  /** Frame sampling plan for videos: every `stride`-th frame index up
    * to n_frames (the explode that fans a video row out to per-frame
    * work items, partitioned by media_id for downstream decode).
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, bytes: Array[Byte])

  /** STUB resize: aspect-preserving fit into (maxW, maxH), never
    * upscaling; the "pixels" are a deterministic byte slice standing
    * in for the re-encoded image. Real deployments swap the kernel;
    * the per-partition scaler init and the output contract (dims
    * within the box, aspect ratio preserved) are the tested part.
    */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition scaler/codec init would go here
      rows.map { m =>
        val d = decodeOne(m)
        val scale = math.min(1.0, math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
        val w = math.max(1, math.round(d.width * scale).toInt)
        val h = math.max(1, math.round(d.height * scale).toInt)
        val outLen = math.max(1, (m.bytes.length * scale).toInt)
        ResizedMedia(m.media_id, m.kind, w, h, m.bytes.take(outLen))
      }
    }
  }
}
