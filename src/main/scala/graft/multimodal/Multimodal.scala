package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as batched per-partition functions (the Scala
  * analog of `mapInPandas` — one iterator per partition, vectorizable).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes. The Spark-side contract — schema, partitioning,
  * batch iteration shape — is real and tested, so swapping in a real decoder
  * is a one-function change.
  */
object Multimodal {

  /** media table schema: binary payload + typed metadata (SURVEY brief). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))), nullable = true)))

  val featureDim = 16

  /** STUB decoder: deterministic fake features from payload bytes (rolling
    * polynomial over bytes, normalized). Replace with a real codec in
    * production; signature and batching stay identical.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload == null) return out
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % featureDim) += (h & 0xffff) / 65535.0f
      i += 1
    }
    val n = math.max(payload.length / featureDim, 1)
    out.map(_ / n)
  }

  /** Batched feature extraction: one partition = one iterator (exactly the
    * `mapInPandas` batch shape). Output schema: media_id, kind, features.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), r.getString(kindIdx), decodeStub(payload).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling plumbing for video payloads: emit one row per sampled
    * frame index (the decode of each frame is the same stub). Demonstrates
    * the 1→N batch expansion shape used by real frame extraction.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    val frames = media
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        col("payload"),
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs)))
          .as("frame_ts_ms"))
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_ts_ms", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val rdd = frames.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        // fake per-frame decode: mix the frame ts into the stub
        val ts = r.getLong(2)
        val base = decodeStub(payload)
        Row(r.getLong(0), ts, base.map(f => f + (ts % 7) * 1e-3f).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize plumbing for image payloads: recompute the metadata struct to the
    * target box (aspect-preserving fit) and re-derive the payload through the
    * stub codec. The geometry math is real; only the pixel resample is the
    * stub. Output schema matches the input media schema, so resize composes
    * with extract/sample in a pipeline.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    val idx = Map(
      "media_id" -> media.schema.fieldIndex("media_id"),
      "kind" -> media.schema.fieldIndex("kind"),
      "payload" -> media.schema.fieldIndex("payload"),
      "meta" -> media.schema.fieldIndex("meta"))
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(idx("kind"))
        val meta = r.getStruct(idx("meta"))
        val payload =
          if (r.isNullAt(idx("payload"))) null else r.getAs[Array[Byte]](idx("payload"))
        if (kind != "image" || meta == null || meta.isNullAt(0) || meta.isNullAt(1)) r
        else {
          val (w, h) = (meta.getInt(0), meta.getInt(1))
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // stub resample: deterministic payload shrink proportional to area
          val outLen =
            if (payload == null) 0
            else math.max(1, (payload.length * (nw.toLong * nh) / (w.toLong * h)).toInt)
          val resampled =
            if (payload == null) null
            else java.util.Arrays.copyOf(payload, outLen)
          // rebuild in the INPUT row's column order (fieldIndex-driven) and
          // only patch width/height inside meta, so arbitrary column order
          // and extended meta structs survive
          val newMeta = Row.fromSeq(meta.toSeq.updated(0, nw).updated(1, nh))
          Row.fromSeq(r.toSeq
            .updated(idx("payload"), resampled)
            .updated(idx("meta"), newMeta))
        }
      }
    }
    spark.createDataFrame(rdd, media.schema)
  }

  /** Deterministic synthetic media fixture (payload bytes from a seeded
    * generator) — lets tests exercise the full plumbing without codecs.
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rnd = new java.util.Random(i)
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = new Array[Byte](64 + (i % 32))
      rnd.nextBytes(payload)
      Row(
        i.toLong,
        kind,
        payload,
        Row(640, 480, if (kind == "video") 10000L else 0L, "synthetic"))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      mediaSchema)
  }
}
