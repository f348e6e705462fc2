package graft.sources

import graft.core._
import graft.sources.db2.{AsnSeq, Db2AsnChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Db2 ASN capture: the poll family's Db2 variant. The family-distinct
  * property under test is the update encoding — NO update operation code;
  * a 'D' row immediately followed by an 'I' row in one COMMITSEQ is one
  * update, reassembled positionally (the reference's LEAD/LAG query,
  * `Db2Connection.java:62-73`). */
class Db2AsnChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("asn.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource() =
    new Db2AsnChangeSource(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))

  private def upd(id: Long, v: String) =
    DataChangeEvent.update(tid, Map("id" -> id), Map("id" -> id, "v" -> v))

  test("AsnSeq: packing is an order embedding; 20-hex render") {
    assert(AsnSeq.of(2, 0) > AsnSeq.of(1, 0xffff))
    assert(AsnSeq.of(1, 2) > AsnSeq.of(1, 1))
    assert(AsnSeq.of(0x1000, 3).asString.length == 20)
    assert(AsnSeq.of(5, 7).commitSeq == 5 && AsnSeq.of(5, 7).intentSeq == 7)
    intercept[IllegalArgumentException](AsnSeq.of(0x800000000000L, 0)) // sign flip
    intercept[IllegalArgumentException](AsnSeq.of(0, 0x10000L))
  }

  test("SYNCHPOINT lag: committed txs invisible until the Capture program runs") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(1L, "x")))
    assert(s.uncapturedTxCount == 1)
    assert(s.currentOffset == base, "SYNCHPOINT only moves when Capture copies")
    assert(s.readLog(base, Long.MaxValue).isEmpty)
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "x")))
    s.runCaptureProgram()
    assert(s.currentOffset > base)
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 1 &&
      recs.head.event.asInstanceOf[DataChangeEvent].after("v") == "x")
  }

  test("updates are D/I pairs: one event, full before image, 'I' position") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(3L, "a"), upd(4L, "b")))
    s.runCaptureProgram()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 2, "two updates = four CD rows = two events")
    val e0 = recs.head.event.asInstanceOf[DataChangeEvent]
    assert(e0.op == OperationType.UPDATE)
    assert(e0.before == Map("id" -> 3L, "v" -> "init"),
      "the 'D' half carries the FULL before image")
    assert(e0.after == Map("id" -> 3L, "v" -> "a"))
    // emitted at the 'I' row's position: intent seqs are 1,2 (pair one)
    // and 3,4 (pair two) within one commit
    assert(AsnSeq(recs(0).offset).intentSeq == 2)
    assert(AsnSeq(recs(1).offset).intentSeq == 4)
    assert(recs.head.event.asInstanceOf[DataChangeEvent].meta("cd_table") ==
      "ASNCDC.CDUSERS")
  }

  test("positional pairing corollary: delete then insert in one tx reads as update") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(
      DataChangeEvent.delete(tid, Map("id" -> 5L)),
      DataChangeEvent.insert(tid, Map[String, Any]("id" -> 5L, "v" -> "reborn"))))
    s.runCaptureProgram()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 1, "adjacent D+I in one commit is ONE update to ASN")
    val e = recs.head.event.asInstanceOf[DataChangeEvent]
    assert(e.op == OperationType.UPDATE && e.before("v") == "init" &&
      e.after("v") == "reborn")
  }

  test("non-adjacent D and I stay separate events; windows respect boundaries") {
    val s = newSource()
    val base = s.currentOffset
    // delete(6), then an UPDATE pair, then insert(99): the D and the final
    // I are not adjacent, so they must NOT pair
    s.commitTx(Seq(
      DataChangeEvent.delete(tid, Map("id" -> 6L)),
      upd(7L, "u7"),
      DataChangeEvent.insert(tid, Map[String, Any]("id" -> 99L, "v" -> "new"))))
    s.runCaptureProgram()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.map(_.event.asInstanceOf[DataChangeEvent].op) ==
      Seq(OperationType.DELETE, OperationType.UPDATE, OperationType.INSERT))
    // replay from a checkpoint mid-stream: only later records return
    val mid = recs(1).offset
    val tail = s.readLog(mid, s.currentOffset)
    assert(tail.map(_.event.asInstanceOf[DataChangeEvent].op) ==
      Seq(OperationType.INSERT))
  }
}
