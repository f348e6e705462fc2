package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** Real, dependency-free media codecs (JDK only):
  *
  *  - images: PNG encode/decode through `javax.imageio` (lossless, so decoded
  *    pixels are bit-exact and every derived feature is deterministic);
  *  - audio: PCM16 mono WAV with a hand-rolled RIFF writer/parser (the format
  *    is a 44-byte header + little-endian samples — parsing it IS the codec);
  *  - video: an MJPEG-style container (`GVID`) of length-prefixed PNG frames
  *    at a fixed frame interval — the JDK has no video codec, but the
  *    motion-JPEG approach (independent intra-coded frames) is a real, widely
  *    used layout, and every frame decode below is a genuine PNG decode.
  *
  * All pixel math runs over row-major ARGB ints in deterministic order, so
  * distributed (mapPartitions) and driver-side replays agree to the bit.
  */
object MediaCodecs {

  // ------------------------------------------------------------------ images

  def encodePng(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    require(argb.length == w * h, s"pixel buffer ${argb.length} != ${w}x$h")
    // ARGB, not RGB: an RGB raster silently forces every alpha byte to 0xFF,
    // so decode(encode(px)) != px for any translucent pixel — breaking the
    // file's bit-exact roundtrip contract (PNG carries alpha losslessly)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, w, h, argb, 0, w)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** → (width, height, row-major ARGB pixels). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    // uniform decode-error contract: truncated/corrupt payloads raise
    // IllegalArgumentException like the WAV/GVID parsers, never a raw
    // IIOException/EOFException from inside ImageIO
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(s"corrupt image payload: ${e.getMessage}", e)
      }
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** Deterministic nearest-neighbor resample (own pixel loop, no Graphics2D —
    * identical output on any JVM). */
  def resizeNearest(px: Array[Int], w: Int, h: Int, nw: Int, nh: Int): Array[Int] = {
    val out = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * h / nh).toInt
      var x = 0
      while (x < nw) {
        out(y * nw + x) = px((x.toLong * w / nw).toInt + sy * w)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-dim image feature: mean luma of a 4x4 spatial grid, normalized to
    * [0,1] — the classic tiny "thumbnail signature" layout. */
  def imageFeatures(px: Array[Int], w: Int, h: Int): Array[Float] = {
    val sums = new Array[Double](16)
    val counts = new Array[Long](16)
    var y = 0
    while (y < h) {
      val gy = math.min(y * 4 / h, 3)
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val luma = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        val cell = gy * 4 + math.min(x * 4 / w, 3)
        sums(cell) += luma
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(16)(i => if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
  }

  // ------------------------------------------------------------------- audio

  /** PCM16 mono RIFF/WAVE writer — the standard 44-byte header. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF/WAVE parser (PCM16 mono): walks chunks to `fmt ` and `data` —
    * tolerant of extra chunks, strict on the format fields it relies on.
    * → (sampleRate, samples).
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes, header needs 12")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = { val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII") }
    require(ascii(4) == "RIFF", "not a RIFF file")
    buf.getInt // riff size
    require(ascii(4) == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = ascii(4)
      val len = buf.getInt
      // embedded length fields are untrusted: a truncated/corrupt payload must
      // fail as a clear decode error, not BufferUnderflow/NegativeArraySize
      require(len >= 0 && len <= buf.remaining(),
        s"corrupt WAV: chunk '$id' declares $len bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(len >= 16, s"corrupt WAV: fmt chunk of $len bytes, needs 16")
          val fmt = buf.getShort; val ch = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          val bits = buf.getShort
          require(fmt == 1 && ch == 1 && bits == 16, s"unsupported WAV: fmt=$fmt ch=$ch bits=$bits")
          if (len > 16) buf.position(buf.position() + (len - 16))
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ =>
          // chunks are word-aligned; the pad byte may be absent at EOF
          buf.position(math.min(buf.position() + len + (len & 1), buf.limit()))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  /** 16-dim audio feature: RMS of 16 equal time slices, normalized. */
  def audioFeatures(samples: Array[Short]): Array[Float] = {
    if (samples.isEmpty) return new Array[Float](16)
    val out = new Array[Float](16)
    var s = 0
    while (s < 16) {
      val from = (s.toLong * samples.length / 16).toInt
      val to = ((s + 1).toLong * samples.length / 16).toInt
      var acc = 0.0
      var i = from
      while (i < to) { val v = samples(i) / 32768.0; acc += v * v; i += 1 }
      out(s) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
      s += 1
    }
    out
  }

  // ------------------------------------------------------------------- video

  private val GvidMagic = 0x47564944 // "GVID"

  /** Container layout (big-endian): magic, frameIntervalMs, frameCount,
    * then per frame [byteLen, png bytes]. */
  def encodeGvid(frames: Seq[Array[Byte]], frameIntervalMs: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + frames.map(_.length + 4).sum)
    buf.putInt(GvidMagic).putInt(frameIntervalMs).putInt(frames.size)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** → (frameCount, frameIntervalMs). */
  def gvidInfo(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 12, s"truncated GVID: ${bytes.length} bytes, header needs 12")
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt == GvidMagic, "not a GVID payload")
    val interval = buf.getInt
    (buf.getInt, interval)
  }

  /** Extract (without decoding) the PNG bytes of frame `idx`. */
  def gvidFrame(bytes: Array[Byte], idx: Int): Array[Byte] = {
    require(bytes.length >= 12, s"truncated GVID: ${bytes.length} bytes, header needs 12")
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt == GvidMagic, "not a GVID payload")
    buf.getInt
    val n = buf.getInt
    require(idx >= 0 && idx < n, s"frame $idx out of $n")
    // frame length fields are untrusted — validate against the real buffer
    def frameLen(): Int = {
      require(buf.remaining() >= 4, "corrupt GVID: truncated frame header")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"corrupt GVID: frame declares $len bytes, ${buf.remaining()} remain")
      len
    }
    var i = 0
    while (i < idx) { val len = frameLen(); buf.position(buf.position() + len); i += 1 }
    val out = new Array[Byte](frameLen())
    buf.get(out)
    out
  }
}
