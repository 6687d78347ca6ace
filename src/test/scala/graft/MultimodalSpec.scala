package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Plumbing tests for the multimodal binary-column pipeline (decode /
  * features / frame sampling are STUB kernels; schema, determinism
  * and batch shape are the real contract under test).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    MultimodalOps.syntheticMedia(Tables.load(spark, sfDir, "documents"))

  test("decode emits one row per media item with stable fake dims") {
    val d1 = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    val d2 = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    assert(d1.length === media.count())
    assert(d1.map(_.width).toSeq === d2.map(_.width).toSeq, "decode must be deterministic")
    assert(d1.forall(m => m.width >= 64 && m.height >= 64))
    assert(d1.filter(_.kind != "video").forall(_.n_frames === 1))
  }

  test("feature extraction yields fixed-dim float vectors usable by cosine ops") {
    val f = MultimodalOps.extractFeatures(media, dim = 16)
    assert(f.filter(size($"embedding") =!= 16).count() === 0)
    val sim = f.as("a").join(f.as("b"), $"a.media_id" === $"b.media_id")
      .select(graft.functions.FlinkFunctions.cosineSimilarity(
        $"a.embedding", $"b.embedding").as("c"))
      .agg(min($"c")).first().getDouble(0)
    assert(sim > 0.999, "self-similarity must be 1")
  }

  test("resize fits the box, preserves aspect ratio, never upscales") {
    val resized = MultimodalOps.resize(media, maxW = 256, maxH = 128).collect()
    val dims = MultimodalOps.decode(media).collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      assert(r.width <= 256 && r.height <= 128, s"${r.media_id} out of box")
      val d = dims(r.media_id)
      assert(r.width <= d.width && r.height <= d.height, "no upscaling")
      // aspect preserved within rounding
      val in = d.width.toDouble / d.height
      val out = r.width.toDouble / r.height
      assert(math.abs(in - out) / in < 0.05, s"aspect drift ${in} -> ${out}")
      assert(r.bytes.nonEmpty)
    }
  }

  test("media features feed the similarity operators end to end") {
    val ann = operators.MiscQueries.multimodalAnn(spark, sfDir).collect()
    assert(ann.nonEmpty)
    val perQuery = ann.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perQuery === Set(3), s"each query media should get top-3: $perQuery")
  }

  test("frame sampling explodes only videos, stride respected") {
    val d = MultimodalOps.decode(media)
    val frames = MultimodalOps.sampleFrames(d, stride = 10)
    val videos = d.filter($"kind" === "video")
    val expected = videos.select(
      aggregate(sequence(lit(0), $"n_frames" - 1, lit(10)),
        lit(0L), (acc, _) => acc + 1).as("k"))
      .agg(sum($"k")).first().getLong(0)
    assert(frames.count() === expected)
  }
}
