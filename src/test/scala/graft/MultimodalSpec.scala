package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Multimodal binary-column pipeline: images decode through the REAL
  * javax.imageio codec, audio through javax.sound.sampled, and video
  * through the real MJPEG/AVI container codec (AviMjpeg) — dims,
  * frame counts, fps and channel means asserted against the encoded
  * fixtures.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    MultimodalOps.syntheticMedia(Tables.load(spark, sfDir, "documents"))

  test("decode emits one row per media item with deterministic dims") {
    val d1 = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    val d2 = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    assert(d1.length === media.count())
    assert(d1.map(_.width).toSeq === d2.map(_.width).toSeq, "decode must be deterministic")
    // video rows decode REAL container metadata; audio rows have no
    // spatial dims but real sample counts
    d1.filter(_.kind == "video").foreach { m =>
      val (w, h) = MultimodalOps.syntheticImageDims(m.media_id)
      assert(m.width === w && m.height === h,
        s"video ${m.media_id}: decoded ${m.width}x${m.height}, encoded ${w}x$h")
      assert(m.n_frames >= 2 && m.n_frames <= 6)
      assert(m.sample_rate >= 5 && m.sample_rate <= 29, "fps rides in sample_rate")
      assert(m.duration_s > 0.0)
    }
    assert(d1.filter(_.kind == "audio").forall(m =>
      m.width === 0 && m.height === 0 && m.n_frames >= 400))
    assert(d1.filter(_.kind == "image").forall(_.n_frames === 1))
  }

  test("image rows decode REAL dimensions and in-range channel means") {
    val imgs = MultimodalOps.decode(media).collect().filter(_.kind == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      val (w, h) = MultimodalOps.syntheticImageDims(m.media_id)
      assert(m.width === w && m.height === h,
        s"media ${m.media_id}: decoded ${m.width}x${m.height}, encoded ${w}x$h")
      for (c <- Seq(m.mean_r, m.mean_g, m.mean_b))
        assert(c >= 0.0 && c <= 255.0, s"channel mean out of range: $c")
    }
  }

  test("codec: known 2x2 PNG and BMP fixtures decode exact dims and channel means") {
    // red, green, blue, white — means are exact (PNG/BMP are lossless)
    val pix = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    val png = MultimodalOps.encodePng(2, 2, (x, y) => pix(y * 2 + x))
    val s = MultimodalOps.decodeImage(png).get
    assert(s.width === 2 && s.height === 2)
    assert(s.meanR === 127.5 && s.meanG === 127.5 && s.meanB === 127.5)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, pix(y * 2 + x))
    val bmpOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpOut)
    val b = MultimodalOps.decodeImage(bmpOut.toByteArray).get
    assert((b.width, b.height, b.meanR, b.meanG, b.meanB) === ((2, 2, 127.5, 127.5, 127.5)))
    // non-image payloads are rejected, not mis-decoded
    assert(MultimodalOps.decodeImage("not an image".getBytes).isEmpty)
  }

  test("a 'BM'-prefixed non-image payload degrades to the stub, not a task failure") {
    // the JDK BMP reader claims streams on a 2-byte magic and then
    // throws on the garbage header — decode must fall back, not crash
    val fake = "BMW is not a bitmap".getBytes
    assert(MultimodalOps.decodeImage(fake).isEmpty)
    val one = spark.createDataset(Seq(
      MultimodalOps.MediaRow(9L, "audio", fake, "fixture")))
    val d = MultimodalOps.decode(one).collect().head
    assert(d.width >= 64 && d.height >= 64, "stub metadata path expected")
    val r = MultimodalOps.resize(one, maxW = 16, maxH = 16).collect().head
    assert(r.width <= 16 && r.height <= 16)
  }

  test("real image resize: 64x32 gray PNG into a 32x16 box keeps pixel content") {
    val gray = MultimodalOps.encodePng(64, 32, (_, _) => 0x808080)
    val one = spark.createDataset(Seq(
      MultimodalOps.MediaRow(1L, "image", gray, "fixture")))
    val r = MultimodalOps.resize(one, maxW = 32, maxH = 16).collect().head
    assert(r.width === 32 && r.height === 16)
    val s = MultimodalOps.decodeImage(r.bytes).get
    assert(s.width === 32 && s.height === 16)
    // bilinear resample of a constant image is the same constant
    assert(s.meanR === 128.0 && s.meanG === 128.0 && s.meanB === 128.0)
  }

  test("codec: known WAV sine fixture decodes exact rate/frames/duration and RMS") {
    // 1 s of a 440 Hz sine at amplitude 0.5: RMS = 0.5/sqrt(2)
    val sr = 8000
    val samples = Array.tabulate(sr)(i =>
      (0.5 * 32767.0 * math.sin(2.0 * math.Pi * 440 * i / sr)).toShort)
    val wav = MultimodalOps.encodeWav(sr, samples)
    assert(MultimodalOps.looksLikeWav(wav))
    val a = MultimodalOps.decodeAudio(wav).get
    assert(a.sampleRate === sr && a.channels === 1 && a.nFrames === sr.toLong)
    assert(math.abs(a.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms ${a.rms}")
    // silence has RMS 0
    val silent = MultimodalOps.decodeAudio(
      MultimodalOps.encodeWav(sr, new Array[Short](100))).get
    assert(silent.rms === 0.0 && silent.nFrames === 100L)
  }

  test("audio rows decode REAL sample rate, duration and RMS through the pipeline") {
    val dec = MultimodalOps.decode(media).toDF()
    val audio = dec.filter($"kind" === "audio")
    assert(audio.count() > 0)
    // every audio row carries the fixture rate and a consistent
    // frames/duration relationship; tone amplitude >= 0.2 -> RMS > 0.1
    assert(audio.filter($"sample_rate" =!= 8000).count() === 0)
    assert(audio.filter(abs($"duration_s" * 8000 - $"n_frames") > 0.5).count() === 0)
    assert(audio.filter($"rms" < 0.1 || $"rms" > 1.0).count() === 0)
    // a RIFF-prefixed garbage payload degrades to the stub, not a crash
    val junk = "RIFFxxxxWAVEgarbage-not-a-real-wav-file".getBytes("UTF-8")
    val one = spark.createDataset(Seq(
      MultimodalOps.MediaRow(7L, "audio", junk, "fixture")))
    val r = MultimodalOps.decode(one).collect().head
    assert(r.sample_rate === 0 && r.rms === 0.0)
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
    // audio has no spatial dims to resize — it passes through as a
    // 1x1 stand-in; the contract applies to the spatial kinds
    resized.filter(r => dims(r.media_id).kind != "audio").foreach { r =>
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


  test("AVI/MJPEG codec round-trips: headers exact, frames decode as JPEG") {
    import graft.multimodal.AviMjpeg
    val imgs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(20, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 20) img.setRGB(x, y, (x * 13 + y * 7 + f) << 8)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val avi = AviMjpeg.encode(20, 12, 15, imgs)
    val meta = AviMjpeg.parse(avi).get
    assert(meta.width === 20 && meta.height === 12)
    assert(meta.nFrames === 3 && meta.fps === 15.0)
    val frames = AviMjpeg.frames(avi)
    assert(frames.length === 3)
    frames.foreach { f =>
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(dec.getWidth === 20 && dec.getHeight === 12)
    }
    // non-AVI bytes are rejected, not misparsed
    assert(AviMjpeg.parse("not an avi at all".getBytes).isEmpty)
    assert(AviMjpeg.frames("RIFFxxxx".getBytes).isEmpty)
    // corrupt size fields degrade to unparseable — no hang, no crash
    val corrupt = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ Array[Byte](-8, -1, -1, -1) ++ Array.fill[Byte](8)(0)
    assert(AviMjpeg.parse(corrupt).isEmpty)
    assert(AviMjpeg.frames(corrupt).isEmpty)
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 2)
    AviMjpeg.parse(truncated) // must not throw
    AviMjpeg.frames(truncated) // must not throw
  }

  test("featuresOf degrades to byteFold on an AVI whose first frame is corrupt JPEG") {
    import graft.multimodal.AviMjpeg
    // well-formed container, garbage frame payload: the frame bytes
    // claim JPEG position in the stream but decode to null/throw
    val junkFrame = Array.fill[Byte](256)(0x5a)
    val avi = AviMjpeg.encode(20, 12, 15, Seq(junkFrame))
    assert(AviMjpeg.frames(avi).length === 1)
    // must not NPE; falls through to the deterministic byte-fold
    val f = MultimodalOps.featuresOf(avi, 16)
    assert(f.length === 16)
    assert(f sameElements MultimodalOps.featuresOf(avi, 16), "deterministic fallback")
  }

  test("per-frame decode: one parse per video, sampled frames carry real pixel stats") {
    val stats = MultimodalOps.decodeSampledFrames(media, stride = 2).collect()
    assert(stats.nonEmpty)
    val byVideo = stats.groupBy(_.media_id)
    byVideo.foreach { case (id, fs) =>
      val (w, h) = MultimodalOps.syntheticImageDims(id)
      fs.foreach { f =>
        assert(f.width === w && f.height === h)
        assert(f.frame_idx % 2 === 0, "stride must be respected")
        for (c <- Seq(f.mean_r, f.mean_g, f.mean_b))
          assert(c >= 0.0 && c <= 255.0)
      }
      // frames 0,2,4 of a 2..6-frame video → 1..3 sampled frames
      assert(fs.length >= 1 && fs.length <= 3)
    }
  }

  test("content features are REAL: thumbnail grid for images/video, RMS envelope for audio") {
    // a solid mid-gray image embeds as a flat 0.5-ish grid
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val gridEmb = MultimodalOps.featuresOf(out.toByteArray, 16)
    assert(gridEmb.length === 16)
    gridEmb.foreach(c => assert(math.abs(c - 0x80 / 255.0f) < 0.01, s"cell $c"))
    // a half-black half-white image separates in the grid
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val out2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out2)
    val split = MultimodalOps.featuresOf(out2.toByteArray, 16)
    assert(split(0) < 0.1 && split(3) > 0.9, s"left dark, right bright: ${split.toSeq}")
    // audio: constant amplitude embeds as a flat RMS envelope
    val tone = MultimodalOps.encodeWav(8000, Array.fill[Short](8000)(16384))
    val env = MultimodalOps.featuresOf(tone, 8)
    assert(env.length === 8)
    env.foreach(c => assert(math.abs(c - 0.5f) < 0.01, s"window $c"))
    // video: first frame's grid
    val avi = MultimodalOps.encodeSyntheticVideo(3L)
    assert(MultimodalOps.featuresOf(avi, 16).exists(_ > 0.0f))
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
