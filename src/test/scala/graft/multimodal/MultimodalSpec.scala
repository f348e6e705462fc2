package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark-side multimodal contract: schema, batching shape, determinism,
  * and composition — everything except the stubbed pixel/sample codecs.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("extractFeatures: one row per media, fixed dim, deterministic") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.length == 30)
    assert(f1.forall(_.getSeq[Float](2).size == Multimodal.featureDim))
    assert(f1.map(_.getSeq[Float](2)).toSeq == f2.map(_.getSeq[Float](2)).toSeq)
  }

  test("extractFeatures matches a driver-side replay of the stub codec") {
    // self-oracle: regenerate the deterministic payloads on the driver and
    // run decodeStub directly — the distributed mapPartitions result must be
    // value-identical (this is what backs the m_media_features VALUES oracle)
    val got = Multimodal.extractFeatures(media).orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    (0 until 30).foreach { i =>
      val rnd = new java.util.Random(i)
      val payload = new Array[Byte](64 + (i % 32))
      rnd.nextBytes(payload)
      assert(got(i.toLong) == Multimodal.decodeStub(payload).toSeq,
        s"feature mismatch for media_id=$i")
    }
  }

  test("sampleFrames: one row per sampled timestamp of video rows only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 2500)
    val videos = media.filter(col("kind") === "video").count()
    // duration 10000ms, every 2500ms -> ts 0,2500,5000,7500,10000 = 5 frames
    assert(frames.count() == videos * 5)
    assert(frames.select("media_id").distinct().count() == videos)
  }

  test("resize: aspect-preserving fit, only images touched, schema preserved") {
    val out = Multimodal.resize(media, maxW = 320, maxH = 320)
    assert(out.schema == media.schema)
    val images = out.filter(col("kind") === "image").select("meta.width", "meta.height")
      .collect()
    // 640x480 into 320x320 box -> 320x240
    assert(images.forall(r => r.getInt(0) == 320 && r.getInt(1) == 240))
    val untouched = out.filter(col("kind") =!= "image").select("meta.width").collect()
    assert(untouched.forall(_.getInt(0) == 640))
    // payload shrank proportionally to area for images
    val shrunk = out.filter(col("kind") === "image")
      .select(length(col("payload"))).collect().map(_.getInt(0))
    val orig = media.filter(col("kind") === "image")
      .select(length(col("payload"))).collect().map(_.getInt(0))
    assert(shrunk.zip(orig).forall { case (s, o) => s < o && s > 0 })
  }

  test("resize composes with extractFeatures (same pipeline schema)") {
    val f = Multimodal.extractFeatures(Multimodal.resize(media, 100, 100))
    assert(f.count() == 30)
  }
}
