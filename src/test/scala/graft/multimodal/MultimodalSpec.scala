package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal contract over REAL codecs: PNG (ImageIO), WAV (RIFF parser),
  * GVID (PNG-frame container). Covers codec round trips, the distributed
  * batching shape, determinism (distributed == driver-side replay), and
  * pipeline composition.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  // ---------------------------------------------------------------- codecs

  test("PNG round trip is pixel-exact, INCLUDING the alpha channel") {
    // full 32-bit ARGB: an RGB raster would silently force every alpha
    // byte to 0xFF, so decode(encode(px)) != px for translucent pixels —
    // violating the codec's bit-exact contract
    val px = Array.tabulate(40 * 30) { p => (p * 2654435761L).toInt }
    val (w, h, got) = MediaCodecs.decodePng(MediaCodecs.encodePng(40, 30, px))
    assert((w, h) === (40, 30))
    assert(got.toSeq === px.toSeq, "all 32 bits survive, alpha included")
  }

  test("WAV round trip is sample-exact and parses via chunk walk") {
    val samples = Array.tabulate[Short](4000)(t => (math.sin(t * 0.1) * 20000).toShort)
    val (rate, got) = MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 8000))
    assert(rate === 8000)
    assert(got.toSeq === samples.toSeq)
  }

  test("GVID container: every frame extracts byte-exact") {
    val frames = (0 until 5).map(f => Array.tabulate[Byte](100 + f)(j => (j + f).toByte))
    val g = MediaCodecs.encodeGvid(frames, 2500)
    assert(MediaCodecs.gvidInfo(g) === ((5, 2500)))
    (0 until 5).foreach { f =>
      assert(MediaCodecs.gvidFrame(g, f).toSeq === frames(f).toSeq, s"frame $f")
    }
  }

  test("malformed payloads fail with clear decode errors, not buffer faults") {
    val samples = Array.tabulate[Short](100)(identity(_).toShort)
    val wav = MediaCodecs.encodeWav(samples, 8000)
    // truncate mid-data: declared chunk length exceeds actual bytes
    val truncated = wav.take(wav.length - 50)
    val e1 = intercept[IllegalArgumentException](MediaCodecs.decodeWav(truncated))
    assert(e1.getMessage.contains("corrupt WAV"))
    // too short for even the RIFF header
    val e2 = intercept[IllegalArgumentException](MediaCodecs.decodeWav(Array[Byte](1, 2, 3)))
    assert(e2.getMessage.contains("truncated WAV"))
    // GVID with a frame-length field pointing past the buffer
    val g = MediaCodecs.encodeGvid(Seq(Array.tabulate[Byte](64)(identity(_).toByte)), 1000)
    val gTrunc = g.take(g.length - 10)
    val e3 = intercept[IllegalArgumentException](MediaCodecs.gvidFrame(gTrunc, 0))
    assert(e3.getMessage.contains("corrupt GVID"))
    val e4 = intercept[IllegalArgumentException](MediaCodecs.gvidFrame(Array[Byte](1), 0))
    assert(e4.getMessage.contains("truncated GVID"))
  }

  test("nearest-neighbor resize: exact source-pixel mapping") {
    val (w, h, nw, nh) = (8, 6, 4, 3)
    val px = Array.tabulate(w * h)(identity)
    val out = MediaCodecs.resizeNearest(px, w, h, nw, nh)
    for (y <- 0 until nh; x <- 0 until nw)
      assert(out(y * nw + x) === px((x * w / nw) + (y * h / nh) * w))
  }

  // ------------------------------------------------------------- operators

  test("extractFeatures: one row per media, fixed dim, deterministic") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.length == 30)
    assert(f1.forall(_.getSeq[Float](2).size == Multimodal.featureDim))
    assert(f1.map(_.getSeq[Float](2)).toSeq == f2.map(_.getSeq[Float](2)).toSeq)
  }

  test("extractFeatures matches a driver-side decode of the same payloads") {
    // determinism across execution contexts: the distributed mapPartitions
    // result equals decoding the payload directly on the driver (this is
    // what backs the m_media_features VALUES oracle)
    val payloads = media.select("media_id", "kind", "payload").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getAs[Array[Byte]](2)))).toMap
    val got = Multimodal.extractFeatures(media).orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    payloads.foreach { case (id, (kind, payload)) =>
      assert(got(id) == Multimodal.mediaFeatures(kind, payload).toSeq,
        s"feature mismatch for media_id=$id")
    }
  }

  test("audio features reflect the sine amplitude (real WAV decode)") {
    // audio id=1: amp = 0.4 + 0.04*1; RMS of a sine = amp/sqrt(2); all 16
    // slices hold ~that RMS, so sum ≈ 16 * amp / sqrt 2
    val f = Multimodal.extractFeatures(media.filter(col("media_id") === 1))
      .collect()(0).getSeq[Float](2)
    val expected = 16 * (0.44 / math.sqrt(2))
    assert(math.abs(f.sum - expected) < 0.05, s"sum=${f.sum} expected≈$expected")
  }

  test("sampleFrames: one row per sampled timestamp, frames genuinely differ") {
    val frames = Multimodal.sampleFrames(media, everyMs = 2500)
    val videos = media.filter(col("kind") === "video").count()
    // duration 10000ms, every 2500ms -> ts 0,2500,5000,7500,10000 = 5 frames
    assert(frames.count() == videos * 5)
    assert(frames.select("media_id").distinct().count() == videos)
    // real per-frame decode: different frames of one video yield different
    // features (the fixture varies the pattern per frame)
    val one = frames.filter(col("media_id") === 2).orderBy("frame_ts_ms")
      .collect().map(_.getSeq[Float](2))
    assert(one.distinct.length == one.length, "frames decoded identically — not per-frame")
  }

  test("resize: aspect-preserving fit, round-trip decodable, others untouched") {
    val out = Multimodal.resize(media, maxW = 320, maxH = 320)
    assert(out.schema == media.schema)
    val images = Multimodal.withDecodedDims(out.filter(col("kind") === "image"))
      .select(col("meta.width"), col("meta.height"), col("decoded_w"), col("decoded_h"))
      .collect()
    // 640x480 into 320x320 box -> 320x240, and the re-encoded PNG really
    // decodes to those dimensions
    assert(images.forall(r =>
      r.getInt(0) == 320 && r.getInt(1) == 240 && r.getInt(2) == 320 && r.getInt(3) == 240))
    val untouchedVideo = out.filter(col("kind") === "video").select("meta.width").collect()
    assert(untouchedVideo.forall(_.getInt(0) == 64))
  }

  test("resize preserves pixel content at mapped positions") {
    val orig = media.filter(col("kind") === "image" && col("media_id") === 0)
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    val resized = Multimodal.resize(media.filter(col("media_id") === 0), 320, 320)
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    val (w, h, opx) = MediaCodecs.decodePng(orig)
    val (nw, nh, rpx) = MediaCodecs.decodePng(resized)
    assert((nw, nh) === ((320, 240)))
    for (y <- Seq(0, 100, 239); x <- Seq(0, 160, 319))
      assert(rpx(y * nw + x) === opx((x * w / nw) + (y * h / nh) * w))
  }

  test("resize composes with extractFeatures (same pipeline schema)") {
    val f = Multimodal.extractFeatures(Multimodal.resize(media, 100, 100))
    assert(f.count() == 30)
  }
}
