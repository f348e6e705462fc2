package graft.sources

import graft.SparkTestBase
import graft.core._
import graft.sinks.{KafkaBrokerDouble, KafkaWireProducer}
import graft.sources.kafka.KafkaTopicChangeSource
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka topic-partition as a change source: offset mapping (+1, sparse
  * over control markers), debezium op decode, schema-typed images, and
  * read_committed semantics at the source boundary. */
class KafkaTopicSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val tid = TableId.parse("app.t")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  test("readLog decodes ops, maps offsets +1, skips uncommitted data") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.t")
      def rec(json: String) = (null.asInstanceOf[Array[Byte]],
        json.getBytes(UTF_8), 5L)
      p.produce("app.t", 0, Seq(
        rec("""{"before":null,"after":{"id":1,"v":"a"},"op":"c"}"""),
        rec("""{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"},"op":"u"}"""),
        rec("""{"before":{"id":1,"v":"a2"},"after":null,"op":"d"}""")))
      // an OPEN transaction's record must not reach the source
      val txn = "open-txn"
      val (pid, ep) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, ep, "app.t", Seq(0))
      p.produceWithHeaders("app.t", 0,
        Seq((null, """{"before":null,"after":{"id":9,"v":"x"},"op":"c"}"""
          .getBytes(UTF_8), 9L, Nil)),
        txn = Some((txn, pid, ep)))

      val src = new KafkaTopicChangeSource(broker.bootstrap, "app.t", 0, tid, schema)
      val recs = src.readLog(0L, src.currentOffset)
      assert(recs.size == 3, "the open txn's record is held back")
      assert(recs.map(_.offset) == Seq(1L, 2L, 3L), "kafka offset k rides as k+1")
      val evs = recs.map(_.event.asInstanceOf[DataChangeEvent])
      assert(evs.map(_.op.toString) == Seq("INSERT", "UPDATE", "DELETE"))
      assert(evs(1).after("v") == "a2" && evs(1).before("v") == "a")
      assert(evs(2).before("id") == 1L && evs(2).after == Map.empty,
        "absent images ride as the empty map (the DataChangeEvent convention)")
      // resume mid-log: fromExclusive = 1 delivers only offsets 2..3
      assert(src.readLog(1L, src.currentOffset).map(_.offset) == Seq(2L, 3L))
      // commit the txn: its record becomes visible past the markers
      p.endTxn(txn, pid, ep, commit = true)
      val all = src.readLog(0L, src.currentOffset)
      assert(all.size == 4 &&
        all.last.event.asInstanceOf[DataChangeEvent].after("id") == 9L)
      assert(src.snapshotRead(None, None).isEmpty && src.keyStats._3 == 0L)
      p.close()
    } finally broker.stop()
  }

  test("batch frame at the LSO: an open transaction never strands committed records") {
    // The silent-data-loss shape: an EOS producer holds a transaction open
    // across a trigger. A window framed at the HIGH WATERMARK would cross
    // the held-back records — readLog (read_committed) delivers nothing,
    // the checkpoint advances past them, and when the producer commits
    // they are filtered out forever. Framing at the LAST-STABLE offset
    // stops the window short; the records deliver in the next trigger.
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.t")
      val txn = "eos-producer"
      val (pid, ep) = p.initProducerId(txn)
      p.addPartitionsToTxn(txn, pid, ep, "app.t", Seq(0))
      (1 to 3).foreach(i => p.produceWithHeaders("app.t", 0,
        Seq((null, s"""{"before":null,"after":{"id":$i,"v":"x$i"},"op":"c"}"""
          .getBytes(UTF_8), i.toLong, Nil)),
        txn = Some((txn, pid, ep))))
      val src = new KafkaTopicChangeSource(broker.bootstrap, "app.t", 0, tid, schema)
      val frame1 = src.currentOffset
      assert(frame1 == 0L,
        s"the window must stop at the LSO, not cross the open txn (got $frame1)")
      assert(src.readLog(0L, frame1).isEmpty)
      // the trigger boundary passes; the producer now commits
      p.endTxn(txn, pid, ep, commit = true)
      val frame2 = src.currentOffset
      val recs = src.readLog(frame1, frame2)
      assert(recs.size == 3,
        "every committed record delivers in the next window — none stranded")
      assert(recs.map(_.event.asInstanceOf[DataChangeEvent].after("id"))
        == Seq(1L, 2L, 3L))
      p.close()
    } finally broker.stop()
  }

  test("a non-debezium value refuses loudly instead of coining events") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.t")
      p.produce("app.t", 0, Seq((null, """{"op":"zzz"}""".getBytes(UTF_8), 0L)))
      p.close()
      val src = new KafkaTopicChangeSource(broker.bootstrap, "app.t", 0, tid, schema)
      val e = intercept[IllegalArgumentException](src.readLog(0L, src.currentOffset))
      assert(e.getMessage.contains("zzz"))
    } finally broker.stop()
  }

  test("consumer-group offsets: commits reach the coordinator; committed startup resumes") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.t")
      def rec(i: Int) = (null.asInstanceOf[Array[Byte]],
        s"""{"before":null,"after":{"id":$i,"v":"v$i"},"op":"c"}""".getBytes(UTF_8), i.toLong)
      p.produce("app.t", 0, (1 to 6).map(rec))
      val src = new KafkaTopicChangeSource(broker.bootstrap, "app.t", 0, tid, schema,
        groupId = Some("g1"))
      // never committed: the protocol's -1 answer surfaces as None
      assert(src.committedOffset.isEmpty)
      // the stream's durable-commit feedback -> OffsetCommit at the coordinator
      src.commitOffset(4L)
      assert(src.committedOffset.contains(4L))
      // wire-visible to ANY kafka client, not just this source
      val c = new graft.sinks.KafkaWireConsumer(broker.bootstrap)
      assert(c.committedOffset("g1", "app.t", 0).contains(4L))
      assert(c.committedOffset("other-group", "app.t", 0).isEmpty)
      assert(c.findGroupCoordinator("g1")._2 > 0)
      // committing to a topic the broker does not host answers error 3
      intercept[IllegalArgumentException](c.commitOffset("g1", "ghost.topic", 0, 1L))
      c.close()
      // committed log offset 4 = next kafka fetch at 4: records 5..6 remain
      assert(src.readLog(src.committedOffset.get, src.currentOffset)
        .map(_.offset) == Seq(5L, 6L))

      // and through the streaming framework: startup.mode committed anchors
      // the log base at the group's committed offset, not at latest/earliest
      import graft.sources.cdc.{ChangeSourceRegistry, GraftCdcProvider}
      val id = s"kafka-committed-${java.util.UUID.randomUUID().toString.take(8)}"
      ChangeSourceRegistry.register(id, src)
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        val q = spark.readStream.format(classOf[GraftCdcProvider].getName)
          .option("sourceId", id).option("startup.mode", "committed")
          .load().writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            buf ++= b.select("after.id").collect().map(_.getLong(0)); ()
          }.start()
        q.processAllAvailable(); q.stop()
        assert(buf.sorted.toSeq == Seq(5L, 6L),
          "committed startup must replay only past the group's committed offset")
      } finally ChangeSourceRegistry.remove(id)
      p.close()
    } finally broker.stop()
  }

  test("startup by timestamp resolves via broker-side ListOffsets") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.t")
      def rec(i: Int, ts: Long) = (null.asInstanceOf[Array[Byte]],
        s"""{"before":null,"after":{"id":$i,"v":"x$i"},"op":"c"}"""
          .getBytes(UTF_8), ts)
      p.produce("app.t", 0, (0 until 6).map(i => rec(i, 1000L + i * 10)))
      p.close()
      val src = new KafkaTopicChangeSource(broker.bootstrap, "app.t", 0, tid, schema)
      // first record at or after ts=1025 is offset 3 (ts 1030); the
      // fromExclusive contract delivers that record and everything after
      val off = src.offsetAtTimestamp(1025L)
      assert(off == 3L)
      val got = src.readLog(off, src.currentOffset)
        .map(_.event.asInstanceOf[DataChangeEvent].after("id"))
      assert(got == Seq(3L, 4L, 5L))
      assert(src.offsetAtTimestamp(99999L) == src.currentOffset,
        "a future timestamp starts at the log end")
    } finally broker.stop()
  }
}
