package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as batched per-partition functions (the Scala
  * analog of `mapInPandas` — one iterator per partition, vectorizable).
  *
  * The codecs are REAL and dependency-free ([[MediaCodecs]]): PNG through the
  * JDK's ImageIO (lossless → bit-exact pixels), PCM16 WAV through a RIFF
  * parser, and MJPEG-style PNG-frame containers for video. Every feature
  * below is computed from actually-decoded pixels/samples, deterministically,
  * so the driver's DuckDB oracle can carry exact expected values.
  *
  * Scale shape: all operators are map-only (no shuffle, no driver
  * collection); payload bytes stay inside their partition and only the small
  * derived columns (features, dims) leave the operator.
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

  /** Kind-dispatched decode → 16-dim feature vector, all real codecs:
    * image = 4x4 grid luma over decoded PNG pixels, audio = 16-slice RMS over
    * parsed WAV samples, video = image features of the first decoded frame.
    */
  def mediaFeatures(kind: String, payload: Array[Byte]): Array[Float] = {
    if (payload == null) return new Array[Float](featureDim)
    kind match {
      case "image" =>
        val (w, h, px) = MediaCodecs.decodePng(payload)
        MediaCodecs.imageFeatures(px, w, h)
      case "audio" =>
        MediaCodecs.audioFeatures(MediaCodecs.decodeWav(payload)._2)
      case "video" =>
        val (w, h, px) = MediaCodecs.decodePng(MediaCodecs.gvidFrame(payload, 0))
        MediaCodecs.imageFeatures(px, w, h)
      case other => throw new IllegalArgumentException(s"unknown media kind: $other")
    }
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
        val kind = r.getString(kindIdx)
        Row(r.getLong(idIdx), kind, mediaFeatures(kind, payload).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video payloads: one output row per sampled timestamp,
    * each from a REAL decode of the frame covering that timestamp (frame
    * index = ts / container frame interval). The 1→N expansion happens
    * declaratively (`explode`) so Catalyst sizes partitions before the
    * decode-heavy map.
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
        val ts = r.getLong(2)
        val feats =
          if (payload == null) new Array[Float](featureDim)
          else {
            val (n, intervalMs) = MediaCodecs.gvidInfo(payload)
            val idx = math.min(if (intervalMs <= 0) 0L else ts / intervalMs, (n - 1).toLong).toInt
            val (w, h, px) = MediaCodecs.decodePng(MediaCodecs.gvidFrame(payload, idx))
            MediaCodecs.imageFeatures(px, w, h)
          }
        Row(r.getLong(0), ts, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image resize: decode PNG → aspect-preserving fit into `maxW`x`maxH` →
    * deterministic nearest-neighbor resample → re-encode PNG → patch the
    * metadata struct. Non-image rows pass through untouched. Output schema
    * matches the input media schema, so resize composes with
    * extract/sample in a pipeline.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    val idx = Map(
      "kind" -> media.schema.fieldIndex("kind"),
      "payload" -> media.schema.fieldIndex("payload"),
      "meta" -> media.schema.fieldIndex("meta"))
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(idx("kind"))
        val meta = r.getStruct(idx("meta"))
        if (kind != "image" || r.isNullAt(idx("payload"))) r
        else {
          val (w, h, px) = MediaCodecs.decodePng(r.getAs[Array[Byte]](idx("payload")))
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val resampled = MediaCodecs.encodePng(nw, nh, MediaCodecs.resizeNearest(px, w, h, nw, nh))
          // rebuild in the INPUT row's column order (fieldIndex-driven) and
          // only patch width/height inside meta, so arbitrary column order
          // and extended meta structs survive
          val newMeta =
            if (meta == null) null else Row.fromSeq(meta.toSeq.updated(0, nw).updated(1, nh))
          Row.fromSeq(r.toSeq
            .updated(idx("payload"), resampled)
            .updated(idx("meta"), newMeta))
        }
      }
    }
    spark.createDataFrame(rdd, media.schema)
  }

  /** Append `decoded_w`/`decoded_h` INT columns by actually decoding image
    * payloads (NULL for other kinds) — the round-trip proof used by the
    * resize oracle: after [[resize]], decoded dims must equal the patched
    * metadata.
    */
  def withDecodedDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = media.schema
      .add("decoded_w", IntegerType).add("decoded_h", IntegerType)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val dims: Seq[Any] =
          if (r.getString(kindIdx) != "image" || r.isNullAt(payloadIdx)) Seq(null, null)
          else {
            val (w, h, _) = MediaCodecs.decodePng(r.getAs[Array[Byte]](payloadIdx))
            Seq(w, h)
          }
        Row.fromSeq(r.toSeq ++ dims)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic synthetic media fixture with REAL payloads: PNG images
    * (640x480 gradient pattern varying per id), 1-second PCM16 WAV sines
    * (frequency/amplitude varying per id), and 5-frame 64x48 PNG video
    * containers at a 2500 ms frame interval.
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    // generated ON EXECUTORS (map over range) so payload bytes never ship
    // from the driver — the shape a real media table load would have
    val rows = spark.range(n).rdd.map { i0 =>
      val i = i0.toInt
      (i % 3) match {
        case 0 => // image
          Row(i.toLong, "image", imagePayload(i, 640, 480), Row(640, 480, 0L, "png"))
        case 1 => // audio: 1 s mono sine at 8 kHz
          val freq = 220.0 + 10 * i
          val amp = 0.4 + 0.04 * (i % 10)
          val samples = Array.tabulate(8000)(t =>
            (math.sin(2 * math.Pi * freq * t / 8000.0) * amp * 32767).toShort)
          Row(i.toLong, "audio", MediaCodecs.encodeWav(samples, 8000),
            Row(null, null, 1000L, "wav"))
        case 2 => // video: 5 frames, 2500 ms apart -> 10 s span
          val frames = (0 until 5).map(f => framePayload(i, f, 64, 48))
          Row(i.toLong, "video", MediaCodecs.encodeGvid(frames, 2500),
            Row(64, 48, 10000L, "gvid"))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  private def imagePayload(i: Int, w: Int, h: Int): Array[Byte] =
    MediaCodecs.encodePng(w, h, Array.tabulate(w * h) { p =>
      val (x, y) = (p % w, p / w)
      (((x * 7 + i * 13) & 0xff) << 16) | (((y * 5 + i * 29) & 0xff) << 8) |
        (((x + y) * 3 + i * 7) & 0xff)
    })

  private def framePayload(i: Int, f: Int, w: Int, h: Int): Array[Byte] =
    MediaCodecs.encodePng(w, h, Array.tabulate(w * h) { p =>
      val (x, y) = (p % w, p / w)
      (((x * 3 + f * 11 + i * 13) & 0xff) << 16) | (((y * 7 + f * 5 + i) & 0xff) << 8) |
        (((x ^ y) + f + i * 3) & 0xff)
    })
}
