package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Apache Puffin file format — the sidecar Iceberg v3 stores deletion
  * vectors in (public spec: `https://iceberg.apache.org/puffin-spec/`):
  *
  * ```
  * Magic("PFA1") | blob bytes... | Magic | FooterPayload(JSON) |
  *   FooterPayloadSize(int32 LE) | Flags(int32 LE) | Magic
  * ```
  *
  * A `deletion-vector-v1` blob is:
  *
  * ```
  * length(int32 BE, of magic+vector) | vector magic D1 D3 39 64 |
  *   portable 64-bit RoaringBitmapArray | CRC-32(int32 BE, of magic+vector)
  * ```
  *
  * The vector's portable serialization is the SAME layout the Delta
  * protocol uses ([[DeltaReaderFeatures.serializeBitmap]]: magic
  * 1681511377 little-endian — exactly the bytes D1 D3 39 64 — then an
  * 8-byte little-endian bitmap count and the 32-bit roaring bitmaps);
  * the two specs deliberately share it, so the Delta DV machinery decodes
  * Iceberg v3 DVs unchanged.
  */
object IcebergPuffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  /** Build one deletion-vector-v1 blob's bytes for the given positions. */
  private[sinks] def dvBlobBytes(positions: Seq[Long]): Array[Byte] = {
    val vector = DeltaReaderFeatures.serializeBitmap(positions)
    // the portable serialization ALREADY starts with the 4-byte magic
    // D1 D3 39 64 (1681511377 LE) — the spec's "magic + vector" is it whole
    val crc = new CRC32
    crc.update(vector)
    val out = ByteBuffer.allocate(4 + vector.length + 4).order(ByteOrder.BIG_ENDIAN)
    out.putInt(vector.length)
    out.put(vector)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Write a Puffin file holding one deletion-vector-v1 blob per
    * referenced data file. Returns (referencedDataFile, blob offset,
    * blob size, cardinality) per blob — what a manifest entry records. */
  def writeDvFile(path: Path, snapshotId: Long, sequenceNumber: Long,
      dvs: Seq[(String, Seq[Long])]): Seq[(String, Long, Long, Long)] = {
    require(dvs.nonEmpty, "a Puffin DV file needs at least one blob")
    dvs.foreach { case (f, ps) =>
      require(ps.nonEmpty, s"deletion vector for $f has no positions") }
    val body = new java.io.ByteArrayOutputStream()
    body.write(Magic)
    val placed = dvs.map { case (file, positions) =>
      val blob = dvBlobBytes(positions.distinct.sorted)
      val offset = body.size().toLong
      body.write(blob)
      (file, offset, blob.length.toLong, positions.distinct.size.toLong)
    }
    val blobsJson = placed.map { case (file, offset, size, card) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":$offset,"length":$size,""" +
        s""""compression-codec":null,"properties":{""" +
        s""""referenced-data-file":${jsonString(file)},""" +
        s""""cardinality":"$card"}}"""
    }.mkString("[", ",", "]")
    val footerPayload =
      s"""{"blobs":$blobsJson,"properties":{"created-by":"graft"}}"""
        .getBytes(UTF_8)
    body.write(Magic)
    body.write(footerPayload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(footerPayload.length)
    tail.putInt(0) // flags: footer uncompressed
    body.write(tail.array())
    body.write(Magic)
    Files.createDirectories(path.getParent)
    Files.write(path, body.toByteArray)
    placed
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Read + verify one deletion-vector blob: the file must be a Puffin
    * (header magic), the blob's declared length and CRC-32 must hold, and
    * the vector must parse as a portable RoaringBitmapArray. The blob is
    * read with a RANGED channel read at its long offset — never the whole
    * sidecar — so a multi-gigabyte Puffin file costs one header probe
    * plus one blob-sized read, and offsets past 2 GiB stay exact (an int
    * cast would silently wrap them). */
  def readDvBlob(path: String, offset: Long, size: Long)
      : DeltaReaderFeatures.LongBitmap = {
    require(size >= 8 && size <= Int.MaxValue.toLong,
      s"DV blob size $size is outside the readable range [8, 2^31) — " +
        "a single deletion-vector blob larger than 2 GiB is not a shape " +
        "the v3 spec produces; refusing")
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    val blob =
      try {
        val len = ch.size()
        def readFully(at: Long, n: Int): Array[Byte] = {
          val buf = ByteBuffer.allocate(n)
          var pos = at
          while (buf.hasRemaining) {
            val r = ch.read(buf, pos)
            require(r > 0, s"unexpected EOF reading $path at $pos")
            pos += r
          }
          buf.array()
        }
        require(len >= 4 && java.util.Arrays.equals(readFully(0L, 4), Magic),
          s"$path is not a Puffin file (bad header magic)")
        require(offset >= 4 && offset + size <= len,
          s"DV blob [$offset, ${offset + size}) is outside $path ($len bytes)")
        readFully(offset, size.toInt)
      } finally ch.close()
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val vectorLen = buf.getInt()
    require(vectorLen == size - 8,
      s"DV blob declares a $vectorLen-byte vector inside a $size-byte blob " +
        "(want blob = 4 + vector + 4); refusing a malformed vector")
    val vector = java.util.Arrays.copyOfRange(blob, 4, 4 + vectorLen)
    val storedCrc = ByteBuffer.wrap(blob, 4 + vectorLen, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    val crc = new CRC32
    crc.update(vector)
    require(crc.getValue.toInt == storedCrc,
      f"DV blob CRC-32 mismatch (stored 0x$storedCrc%08x, computed " +
        f"0x${crc.getValue.toInt}%08x) — corrupt deletion vector")
    DeltaReaderFeatures.parseBitmap(vector)
  }
}

/** Executor-side cache of parsed deletion vectors, keyed by
  * (puffin path, blob offset): the broadcast carries only O(files)
  * descriptors; each executor opens and parses a blob once, and the row
  * filter is a map-side bitmap probe — the same shape as the Delta DV
  * import, no extra shuffle. */
private[sinks] object IcebergDvCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DeltaReaderFeatures.LongBitmap]()

  def isDeleted(dvByFile: Map[String, (String, Long, Long)],
      file: String, rowIndex: Long): Boolean =
    dvByFile.get(file) match {
      case None => false
      case Some((puffin, offset, size)) =>
        cache.computeIfAbsent(s"$puffin@$offset",
          _ => IcebergPuffin.readDvBlob(puffin, offset, size))
          .contains(rowIndex)
    }
}
