package graft.sources.mysql

import graft.core._
import graft.sources.cdc.LogRecord
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The binlog wire codec + loopback server double: real TCP dump sessions,
  * typed row images, rotation across files, mid-position resume, DDL as
  * QUERY events, and protocol guards. */
class BinlogSocketSpec extends AnyFunSuite {

  private val tid = TableId.parse("app.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newDouble(rotateEvery: Int = 40) =
    new BinlogServerDouble(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")),
      rotateEvery = rotateEvery)

  private def dumpAll(d: BinlogServerDouble, from: Long): Seq[LogRecord] =
    BinlogDumpClient.dump("127.0.0.1", d.port,
      from, d.fieldsAt, MySqlDdlParser.parse(_))

  test("dump over a real socket: insert/update/delete round trip with nulls") {
    val d = newDouble()
    d.start()
    try {
      val base = d.currentOffset
      d.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 100L, "v" -> "a")),
        DataChangeEvent.update(tid,
          Map("id" -> 100L, "v" -> "a"), Map("id" -> 100L, "v" -> null)),
        DataChangeEvent.delete(tid, Map("id" -> 3L, "v" -> "init"))), tsMillis = 5000L)
      val recs = dumpAll(d, base)
      assert(recs.size == 3)
      val Seq(ins, upd, del) = recs.map(_.event.asInstanceOf[DataChangeEvent])
      assert(ins.op == OperationType.INSERT && ins.after == Map("id" -> 100L, "v" -> "a"))
      assert(upd.op == OperationType.UPDATE &&
        upd.before == Map("id" -> 100L, "v" -> "a") &&
        upd.after == Map("id" -> 100L, "v" -> null)) // null survives the bitmap
      assert(del.op == OperationType.DELETE && del.before == Map("id" -> 3L, "v" -> "init"))
      assert(recs.map(_.offset) == recs.map(_.offset).sorted)
      assert(recs.forall(_.tsMillis == 5000L))
      // the table applied the changes (snapshot side): id 3 deleted, 100 live
      assert(d.snapshotRead(Some(3L), Some(4L)).isEmpty)
      assert(d.snapshotRead(Some(100L), None) == Seq(Map("id" -> 100L, "v" -> null)))
    } finally d.stop()
  }

  test("rotation: events span files; a dump from an old file replays across the boundary") {
    val d = newDouble(rotateEvery = 4)
    d.start()
    try {
      val base = d.currentOffset
      (0 until 10).foreach(i => d.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> (200L + i), "v" -> s"x$i")))))
      assert(d.fileCount > 1, "rotation must have produced multiple files")
      val all = dumpAll(d, base)
      assert(all.size == 10)
      assert(all.map(_.offset) == all.map(_.offset).sorted)
      assert(BinlogOffsets.fileIdx(all.head.offset) < BinlogOffsets.fileIdx(all.last.offset))
      // resume from a mid-stream record's offset: exactly the suffix replays
      val mid = all(4).offset
      val suffix = dumpAll(d, mid).filter(_.offset > mid)
      assert(suffix.map(_.offset) == all.drop(5).map(_.offset))
    } finally d.stop()
  }

  test("DDL rides the log as a QUERY event and parses to a SchemaChangeEvent") {
    val d = newDouble()
    d.start()
    try {
      val base = d.currentOffset
      d.commitTx(Seq(DataChangeEvent.insert(tid, Map("id" -> 300L, "v" -> "pre"))))
      val ddlOff = d.appendDdl("ALTER TABLE app.users ADD COLUMN score INT")
      val recs = dumpAll(d, base)
      assert(recs.size == 2)
      assert(recs(1).offset == ddlOff)
      assert(recs(1).event ==
        AddColumnEvent(tid, Seq(AddColumnEvent.ColumnWithPosition("score", CdcTypes.IntT()))))
      // the catalog evolved with it
      assert(d.schema.struct.fieldNames.toSeq == Seq("id", "v", "score"))
      // driver-cheap ddl probe finds it without a socket
      assert(d.firstDdlOffset(base, d.currentOffset).map(_._1).contains(ddlOff))
    } finally d.stop()
  }

  test("ChangeSource adapter: readLog is socket-backed and range-filtered") {
    val d = newDouble()
    d.start()
    try {
      val src = new BinlogSocketChangeSource(d)
      val base = src.currentOffset
      d.commitTx((0 until 6).map(i =>
        DataChangeEvent.update(tid,
          Map("id" -> (i % 3).toLong, "v" -> "init"),
          Map("id" -> (i % 3).toLong, "v" -> s"u$i"))))
      val sessionsBefore = d.dumpSessionCount
      val head = src.currentOffset
      val recs = src.readLog(base, head)
      assert(d.dumpSessionCount == sessionsBefore + 1, "readLog must open a dump session")
      assert(recs.size == 6)
      val mid = recs(2).offset
      assert(src.readLog(mid, head).map(_.offset) == recs.drop(3).map(_.offset))
      assert(src.keyStats._3 == 10L)
    } finally d.stop()
  }

  test("protocol guards: bad command errors; codec rejects rows without TABLE_MAP") {
    val d = newDouble()
    d.start()
    try {
      // speak the connection phase by hand, then send an unsupported command
      val sock = new java.net.Socket("127.0.0.1", d.port)
      try {
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        BinlogWire.readPacket(in)
        BinlogWire.writePacket(out, 1, BinlogWire.encodeHandshakeResponse("x"))
        BinlogWire.readPacket(in)
        BinlogWire.writePacket(out, 0, Array[Byte](0x03) ++ "SELECT 1".getBytes) // COM_QUERY
        val (_, err) = BinlogWire.readPacket(in)
        assert((err(0) & 0xff) == 0xff, "unsupported command must return ERR")
      } finally sock.close()
    } finally d.stop()
  }
}
