package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka wire protocol: varint framing, RecordBatch v2 CRC32C round trip,
  * murmur2 against the vectors from Kafka's own public test suite, and the
  * produce/fetch/metadata flow over real loopback sockets. */
class KafkaWireSpec extends AnyFunSuite {
  import KafkaWire._

  test("zigzag varint/varlong round trip, including negatives and extremes") {
    val ints = Seq(0, 1, -1, 63, 64, -64, -65, 300, -300, Int.MaxValue, Int.MinValue)
    ints.foreach { v =>
      val w = new Writer; w.varint(v)
      assert(new Reader(w.result()).varint() == v, s"varint $v")
    }
    val longs = Seq(0L, -1L, 1L << 40, -(1L << 40), Long.MaxValue, Long.MinValue)
    longs.foreach { v =>
      val w = new Writer; w.varlong(v)
      assert(new Reader(w.result()).varlong() == v, s"varlong $v")
    }
    // one-byte encodings for small values (the spec's zigzag property)
    val w = new Writer; w.varint(-1)
    assert(w.result().length == 1 && (w.result()(0) & 0xff) == 1)
  }

  test("murmur2 matches Kafka's published test vectors") {
    // org.apache.kafka.common.utils.UtilsTest#testMurmur2 (public)
    assert(murmur2("21".getBytes(UTF_8)) == -973932308)
    assert(murmur2("foobar".getBytes(UTF_8)) == -790332482)
    assert(murmur2("a-little-bit-long-string".getBytes(UTF_8)) == -985981536)
    assert(murmur2("a-little-bit-longer-string".getBytes(UTF_8)) == -1486304829)
    assert(murmur2(
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes(UTF_8)) == -58897971)
    assert(murmur2(Array[Byte]('a', 'b', 'c')) == 479470107)
    assert((0 until 100).forall(i =>
      partitionForKey(s"key-$i".getBytes(UTF_8), 6) >= 0))
  }

  test("RecordBatch v2: encode -> decode round trip; CRC catches corruption") {
    val records = Seq(
      ("k1".getBytes(UTF_8), "v1".getBytes(UTF_8), 1000L),
      (null.asInstanceOf[Array[Byte]], "v2".getBytes(UTF_8), 1001L),
      ("k3".getBytes(UTF_8), null.asInstanceOf[Array[Byte]], 999L))
    val batch = encodeBatch(42L, records)
    val back = decodeBatches(batch)
    assert(back.map(_.offset) == Seq(42L, 43L, 44L))
    assert(back.map(_.timestamp) == Seq(1000L, 1001L, 999L))
    assert(new String(back(0).key, UTF_8) == "k1" && back(1).key == null)
    assert(new String(back(1).value, UTF_8) == "v2" && back(2).value == null)
    // flip one payload byte: CRC32C must refuse
    val corrupt = batch.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](decodeBatches(corrupt))
    assert(e.getMessage.contains("CRC32C"))
    // two concatenated batches decode as one stream (the fetch shape)
    val two = batch ++ encodeBatch(45L, Seq(("k".getBytes(UTF_8), "v".getBytes(UTF_8), 5L)))
    assert(decodeBatches(two).map(_.offset) == Seq(42L, 43L, 44L, 45L))
  }

  test("produce/fetch over real sockets: offsets, ordering, high watermark") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 3)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      assert(p.partitionsOf("events") == 3, "metadata auto-creates the topic")
      val off0 = p.produce("events", 1,
        (0 until 5).map(i => (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), i.toLong)))
      assert(off0 == 0L)
      val off1 = p.produce("events", 1,
        (5 until 8).map(i => (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), i.toLong)))
      assert(off1 == 5L, "base offsets advance by record count")
      p.produce("events", 0, Seq(("a".getBytes(UTF_8), "b".getBytes(UTF_8), 0L)))
      p.close()

      val c = new KafkaWireConsumer(broker.bootstrap)
      val all = c.readAll("events", 1)
      assert(all.map(_.offset) == (0L until 8L))
      assert(all.map(r => new String(r.value, UTF_8)) == (0 until 8).map(i => s"v$i"))
      // fetch from a mid offset skips earlier records (batch-granular
      // delivery, record-granular filter)
      val (tail, hw) = c.fetch("events", 1, 6L)
      assert(hw == 8L && tail.map(_.offset) == Seq(6L, 7L))
      assert(c.readAll("events", 0).size == 1)
      assert(c.readAll("events", 2).isEmpty)
      c.close()
      assert(broker.endOffset("events", 1) == 8L)
    } finally broker.stop()
  }

  test("transactions: commit visible, abort invisible, open txn held back") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      // committed transaction
      val txn1 = "txn-a"
      assert(p.findTxnCoordinator(txn1)._2 > 0)
      val (pid1, ep1) = p.initProducerId(txn1)
      p.addPartitionsToTxn(txn1, pid1, ep1, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "c1".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn1, pid1, ep1)))
      p.endTxn(txn1, pid1, ep1, commit = true)
      // aborted transaction
      val txn2 = "txn-b"
      val (pid2, ep2) = p.initProducerId(txn2)
      p.addPartitionsToTxn(txn2, pid2, ep2, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "a1".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn2, pid2, ep2)))
      p.endTxn(txn2, pid2, ep2, commit = false)
      // open (never-ended) transaction: read_committed must hold back
      val txn3 = "txn-c"
      val (pid3, ep3) = p.initProducerId(txn3)
      p.addPartitionsToTxn(txn3, pid3, ep3, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "o1".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn3, pid3, ep3)))

      val c = new KafkaWireConsumer(broker.bootstrap)
      val committed = c.readAllCommitted("t", 0)
        .map(r => new String(r.value, UTF_8))
      assert(committed == Seq("c1"),
        s"only the committed record is visible, got $committed")
      // read_uncommitted sees everything incl. control markers' absence
      val uncommitted = c.readAll("t", 0).filter(_.value.nonEmpty)
        .map(r => new String(r.value, UTF_8))
      assert(uncommitted.contains("a1") && uncommitted.contains("o1"))
      c.close()

      // after txn-c commits, its record becomes visible
      p.endTxn(txn3, pid3, ep3, commit = true)
      val c2 = new KafkaWireConsumer(broker.bootstrap)
      assert(c2.readAllCommitted("t", 0).map(r => new String(r.value, UTF_8)) ==
        Seq("c1", "o1"))
      c2.close()
      p.close()
    } finally broker.stop()
  }

  test("controlMarkers surfaces every (pid, epoch, committed) marker in log order") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      val (pidC, epC) = p.initProducerId("txn-commit")
      p.addPartitionsToTxn("txn-commit", pidC, epC, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "c".getBytes(UTF_8), 0L, Nil)),
        txn = Some(("txn-commit", pidC, epC)))
      p.endTxn("txn-commit", pidC, epC, commit = true)
      val (pidA, epA) = p.initProducerId("txn-abort")
      p.addPartitionsToTxn("txn-abort", pidA, epA, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "a".getBytes(UTF_8), 0L, Nil)),
        txn = Some(("txn-abort", pidA, epA)))
      p.endTxn("txn-abort", pidA, epA, commit = false)
      p.close()
      val c = new KafkaWireConsumer(broker.bootstrap)
      val markers = c.controlMarkers("t", 0)
      c.close()
      assert(markers == Seq((pidC, epC, true), (pidA, epA, false)),
        s"got $markers")
    } finally broker.stop()
  }

  test("resumed read past an abort marker keeps the producer's later committed data") {
    // the task-retry shape: one aborted txn, then a committed txn from the
    // SAME producer. A consumer resuming PAST the abort marker (checkpoint
    // restart) must not have the closed range re-delivered — pre-fix the
    // broker re-sent it, the client re-opened it with no marker ahead, and
    // every later committed batch of that pid was silently dropped
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      val txn = "txn-retry"
      val (pid, e0) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, e0, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "dead".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn, pid, e0)))
      p.endTxn(txn, pid, e0, commit = false) // data@0, abort marker@1
      val (pid2, e1) = p.initProducerId(txn) // retry incarnation, epoch bump
      assert(pid2 == pid && e1 > e0)
      p.addPartitionsToTxn(txn, pid, e1, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "alive".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn, pid, e1)))
      p.endTxn(txn, pid, e1, commit = true) // data@2, commit marker@3

      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAllCommitted("t", 0).map(r => new String(r.value, UTF_8))
        == Seq("alive"))
      // resume past the abort marker: the committed batch must survive
      assert(c.readAllCommitted("t", 0, from = 2).map(r => new String(r.value, UTF_8))
        == Seq("alive"))
      c.close(); p.close()
    } finally broker.stop()
  }

  test("zombie fencing: re-init bumps the epoch, aborts the orphan, fences the old") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val zombie = new KafkaWireProducer(broker.bootstrap)
      zombie.partitionsOf("t")
      val txnId = "task-0"
      val (pid, ep0) = zombie.initProducerId(txnId)
      zombie.addPartitionsToTxn(txnId, pid, ep0, "t", Seq(0))
      zombie.produceWithHeaders("t", 0, Seq((null, "zombie".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txnId, pid, ep0)))
      // the task "dies"; its retry re-initializes the SAME id
      val retry = new KafkaWireProducer(broker.bootstrap)
      val (pid2, ep1) = retry.initProducerId(txnId)
      assert(pid2 == pid && ep1 == ep0 + 1, "same producer id, bumped epoch")
      retry.addPartitionsToTxn(txnId, pid2, ep1, "t", Seq(0))
      retry.produceWithHeaders("t", 0, Seq((null, "good".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txnId, pid2, ep1)))
      retry.endTxn(txnId, pid2, ep1, commit = true)
      // the zombie wakes up and tries to commit: fenced (error 47)
      val e = intercept[IllegalArgumentException](
        zombie.endTxn(txnId, pid, ep0, commit = true))
      assert(e.getMessage.contains("47"))
      // read_committed: the zombie's record is gone, the retry's survives —
      // even though both share ONE producer id (range-bounded filtering)
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAllCommitted("t", 0).map(r => new String(r.value, UTF_8)) ==
        Seq("good"))
      c.close()
      zombie.close(); retry.close()
    } finally broker.stop()
  }

  test("the broker answers CORRUPT_MESSAGE (2) for a CRC-broken batch") {
    val broker = new KafkaBrokerDouble()
    broker.start()
    try {
      val good = encodeBatch(0L, Seq(("k".getBytes(UTF_8), "v".getBytes(UTF_8), 0L)))
      val bad = good.clone()
      bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
      // hand-roll the produce call so we can send corrupt bytes
      val sock = new java.net.Socket("127.0.0.1",
        broker.bootstrap.split(":")(1).toInt)
      val body = new Writer
      body.nullableString(null); body.int16(-1); body.int32(1000)
      body.int32(1); body.string("t")
      body.int32(1); body.int32(0); body.bytes(bad)
      val resp = new Reader(KafkaWire.sendRequest(sock, ApiProduce, 3, 7, "c", body.result()))
      resp.int32(); resp.string(); resp.int32(); resp.int32()
      assert(resp.int16() == 2, "CORRUPT_MESSAGE")
      sock.close()
      assert(broker.endOffset("t", 0) == 0L, "nothing was appended")
    } finally broker.stop()
  }

  test("compression: every codec round-trips; CRC covers the compressed form") {
    val records = (0 until 50).map(i =>
      (s"key-$i".getBytes(UTF_8), (s"value-$i-" + "x" * 100).getBytes(UTF_8),
        1000L + i, Seq("h" -> s"hv$i".getBytes(UTF_8))))
    Seq(CodecGzip, CodecSnappy, CodecLz4, CodecZstd).foreach { codec =>
      val batch = encodeBatchWithHeaders(7L, records, compression = codec)
      val plain = encodeBatchWithHeaders(7L, records)
      assert(batch.length < plain.length,
        s"codec $codec must shrink this repetitive payload " +
          s"(${batch.length} vs ${plain.length})")
      val (meta, back) = decodeBatchesMeta(batch).head
      assert((meta.attributes & CodecMask) == codec)
      assert(back.size == 50)
      assert(back.map(_.offset) == (7L until 57L))
      assert(back.map(_.timestamp) == (1000L until 1050L))
      assert(new String(back(49).value, UTF_8).startsWith("value-49-"))
      assert(new String(back(3).headers.head._2, UTF_8) == "hv3")
      // flip one byte inside the compressed blob: CRC32C refuses before
      // the codec ever sees the corruption
      val corrupt = batch.clone()
      corrupt(corrupt.length - 5) = (corrupt(corrupt.length - 5) ^ 0x01).toByte
      assert(intercept[IllegalArgumentException](decodeBatches(corrupt))
        .getMessage.contains("CRC32C"))
    }
    // codec ids outside the protocol refuse loudly
    assert(intercept[IllegalArgumentException](codecId("brotli"))
      .getMessage.contains("compression.type"))
  }

  test("ListOffsets: timestamp -> first offset, log end, earliest, errors") {
    val broker = new KafkaBrokerDouble()
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      // three batches with ascending timestamps; the middle one compressed
      // (the maxTimestamp prefilter reads the uncompressed header)
      p.produce("lo", 0, (0 until 5).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), 100L + i)))
      p.produceWithHeaders("lo", 0, (5 until 10).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), 100L + i,
          Seq.empty[(String, Array[Byte])])), compression = CodecGzip)
      p.produce("lo", 0, (10 until 15).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), 100L + i)))
      p.close()
      val c = new KafkaWireConsumer(broker.bootstrap)
      try {
        assert(c.offsetForTimestamp("lo", 0, 100L) == Some((0L, 100L)))
        assert(c.offsetForTimestamp("lo", 0, 107L) == Some((7L, 107L)),
          "timestamps inside a compressed batch resolve")
        assert(c.offsetForTimestamp("lo", 0, 114L) == Some((14L, 114L)))
        assert(c.offsetForTimestamp("lo", 0, 115L) == None,
          "no record is that late")
        assert(c.offsetForTimestamp("lo", 0, -1L) == Some((15L, -1L)),
          "-1 asks for the log-end offset")
        assert(c.offsetForTimestamp("lo", 0, -2L) == Some((0L, -1L)),
          "-2 asks for the earliest offset")
        val e = intercept[IllegalArgumentException](
          c.offsetForTimestamp("nope", 0, 0L))
        assert(e.getMessage.contains("error 3"), "unknown topic surfaces")
      } finally c.close()
    } finally broker.stop()
  }

  test("compressed produce/fetch over the wire; txn batches compress too") {
    val broker = new KafkaBrokerDouble()
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      val recs = (0 until 20).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8), i.toLong, Nil))
      p.produceWithHeaders("ct", 0, recs, compression = CodecZstd)
      // a transactional compressed batch, committed — read_committed
      // consumers must decode it past the control marker
      p.findTxnCoordinator("tx-c")
      val (pid, epoch) = p.initProducerId("tx-c")
      p.addPartitionsToTxn("tx-c", pid, epoch, "ct", Seq(0))
      p.produceWithHeaders("ct", 0,
        Seq(("tk".getBytes(UTF_8), "tv".getBytes(UTF_8), 99L, Nil)),
        txn = Some(("tx-c", pid, epoch)), compression = CodecLz4)
      p.endTxn("tx-c", pid, epoch, commit = true)
      p.close()
      val c = new KafkaWireConsumer(broker.bootstrap)
      val vals = c.readAllCommitted("ct", 0).map(r => new String(r.value, UTF_8))
      c.close()
      assert(vals == (0 until 20).map(i => s"v$i") :+ "tv")
    } finally broker.stop()
  }

  test("data-less abort marker must not close a LATER aborted range") {
    // txn 1 registers the partition but produces NOTHING, then aborts —
    // its marker carries no range. txn 2 (same producer id) produces and
    // aborts. A consumer matching markers to ranges by count alone would
    // let the data-less marker consume txn 2's range and deliver txn 2's
    // aborted data under read_committed.
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      val txn = "txn-dataless"
      val (pid, e0) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, e0, "t", Seq(0))
      p.endTxn(txn, pid, e0, commit = false) // abort marker@0, NO range
      val (_, e1) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, e1, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "dead".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn, pid, e1)))
      p.endTxn(txn, pid, e1, commit = false) // data@1, marker@2, range (pid,1)
      val (_, e2) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, e2, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "alive".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn, pid, e2)))
      p.endTxn(txn, pid, e2, commit = true) // data@3, commit marker@4
      p.close()
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAllCommitted("t", 0).map(r => new String(r.value, UTF_8))
        == Seq("alive"),
        "the data-less marker must not unmask txn 2's aborted record")
      c.close()
    } finally broker.stop()
  }

  test("lastStableOffset: open txn holds it below the high watermark") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      p.produceWithHeaders("t", 0, Seq((null, "plain".getBytes(UTF_8), 0L, Nil)))
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.lastStableOffset("t", 0) == 1L, "no open txn: LSO = HW")
      val txn = "txn-lso"
      p.findTxnCoordinator(txn)
      val (pid, ep) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, ep, "t", Seq(0))
      p.produceWithHeaders("t", 0, Seq((null, "held".getBytes(UTF_8), 0L, Nil)),
        txn = Some((txn, pid, ep)))
      assert(c.lastStableOffset("t", 0) == 1L,
        "open txn wrote offset 1: LSO stays at its first offset")
      assert(c.fetch("t", 0, Long.MaxValue >> 1)._2 == 2L, "HW is past it")
      p.endTxn(txn, pid, ep, commit = true)
      assert(c.lastStableOffset("t", 0) == 3L, "commit marker@2: LSO = HW = 3")
      c.close(); p.close()
    } finally broker.stop()
  }

  test("readAllCommitted honors untilExclusive: bounded fetch, bounded records") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("t")
      (0 until 10).foreach(i => p.produceWithHeaders("t", 0,
        Seq((null, s"v$i".getBytes(UTF_8), i.toLong, Nil))))
      p.close()
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAllCommitted("t", 0, from = 2, untilExclusive = 7)
        .map(r => new String(r.value, UTF_8)) == (2 until 7).map(i => s"v$i"))
      assert(c.readAllCommitted("t", 0, untilExclusive = 0).isEmpty)
      c.close()
    } finally broker.stop()
  }
}
