package graft.sources

import graft.core._
import graft.sources.sqlserver.{CtLsn, CtRow, SqlServerChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SqlServerChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("dbo.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource() =
    new SqlServerChangeSource(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))

  private def upd(id: Long, v: String) =
    DataChangeEvent.update(tid, Map("id" -> id), Map("id" -> id, "v" -> v))

  test("CtLsn: three-part parse/format round trip, component bounds, order") {
    for (s <- Seq("00000029:00000fd0:0005", "0000002a:00000010:0000", "07ffffff:00ffffff:0fff")) {
      val l = CtLsn.parse(s)
      assert(l != CtLsn.Invalid || s.forall(c => c == '0' || c == ':'))
      assert(CtLsn.parse(l.asString) == l)
      assert(l.value >= 0, "packed LSNs must stay non-negative for signed SPI comparisons")
    }
    assert(CtLsn.parse("junk") == CtLsn.Invalid)
    assert(CtLsn.parse("1:2") == CtLsn.Invalid)
    // out-of-range components parse to Invalid, never to a sign-flipped value
    assert(CtLsn.parse("0fffffff:00ffffff:0fff") == CtLsn.Invalid)
    // order: vlf dominates block dominates slot
    assert(CtLsn.of(0x2a, 0, 0) > CtLsn.of(0x29, 0xffffff, 0xfff))
    assert(CtLsn.of(0x29, 2, 0) > CtLsn.of(0x29, 1, 0xfff))
    intercept[IllegalArgumentException](CtLsn.of(0x8000000L, 0, 0)) // would flip the sign
    intercept[IllegalArgumentException](CtLsn.of(0x10000000L, 0, 0))
  }

  test("capture lag: committed txs are invisible to polling until the capture job runs") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(1L, "x")))
    assert(s.uncapturedTxCount == 1)
    // the change-table head has NOT moved: the stream plans no window
    assert(s.currentOffset == base)
    assert(s.readLog(base, Long.MaxValue).isEmpty)
    // but the BASE table (what snapshot chunks read) already has the change
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "x")))
    s.runCaptureJob()
    assert(s.currentOffset > base)
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 1 && recs.head.event.asInstanceOf[DataChangeEvent].after("v") == "x")
  }

  test("update pairing: operation-3/4 rows reassemble into one event with FULL before image") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(3L, "a"), upd(4L, "b")))
    s.runCaptureJob()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 2)
    val e = recs.head.event.asInstanceOf[DataChangeEvent]
    assert(e.op == OperationType.UPDATE)
    // the gate fixture passed a KEY-ONLY before; the change table records every column
    assert(e.before == Map("id" -> 3L, "v" -> "init"))
    assert(e.after == Map("id" -> 3L, "v" -> "a"))
    assert(e.meta("event_serial_no") == "1")
    assert(recs(1).event.asInstanceOf[DataChangeEvent].meta("event_serial_no") == "2")
  }

  test("deletes carry the full row image, and offsets are strictly monotone across txs") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(5L, "gone-soon")))
    s.commitTx(Seq(DataChangeEvent.delete(tid, Map("id" -> 5L))))
    s.runCaptureJob()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 2)
    val del = recs(1).event.asInstanceOf[DataChangeEvent]
    assert(del.op == OperationType.DELETE)
    assert(del.before == Map("id" -> 5L, "v" -> "gone-soon"))
    val offs = recs.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
    // half-open range semantics identical to every other ChangeSource
    assert(s.readLog(offs(0), offs(1)).map(_.offset) == Seq(offs(1)))
  }

  test("multi-change tx: per-tx seqvals order rows; commit LSNs stride; meta carries both LSNs") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(1L, "a"), upd(2L, "b"), upd(3L, "c")))
    s.runCaptureJob()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 3)
    val es = recs.map(_.event.asInstanceOf[DataChangeEvent])
    assert(es.map(_.meta("event_serial_no")) == Seq("1", "2", "3"))
    assert(es.map(_.meta("commit_lsn")).distinct.size == 1) // one commit
    assert(es.map(_.meta("change_lsn")).distinct.size == 3) // three row positions
  }

  test("offsetAtTimestamp maps to the first captured commit at/after ts") {
    val s = newSource()
    s.commitTx(Seq(upd(1L, "a")), tsMillis = 1000L)
    s.commitTx(Seq(upd(2L, "b")), tsMillis = 2000L)
    s.runCaptureJob()
    val at = s.offsetAtTimestamp(1500L)
    val recs = s.readLog(at, s.currentOffset)
    assert(recs.size == 1 && recs.head.event.asInstanceOf[DataChangeEvent].after("v") == "b")
  }

  test("change tables are data-only: firstDdlOffset is constant None") {
    val s = newSource()
    s.commitTx(Seq(upd(1L, "a")))
    s.runCaptureJob()
    assert(s.firstDdlOffset(0L, Long.MaxValue).isEmpty)
  }

  test("capture-instance migration: the window drops new columns; the switch surfaces the DDL") {
    val s = newSource()
    val base = s.currentOffset
    s.commitTx(Seq(upd(1L, "pre")))
    s.runCaptureJob()
    // ALTER: catalog evolves now; the ACTIVE instance keeps the old shape
    s.alterTable(AddColumnEvent(tid,
      Seq(AddColumnEvent.ColumnWithPosition("score", CdcTypes.IntT()))))
    assert(s.schema.struct.fieldNames.contains("score"))
    // migration window: the committed tx CARRIES score, capture DROPS it
    s.commitTx(Seq(DataChangeEvent.update(
      tid, Map("id" -> 2L), Map("id" -> 2L, "v" -> "mid", "score" -> 7))))
    s.runCaptureJob()
    // but the BASE table kept it (only capture is behind)
    assert(s.snapshotRead(Some(2L), Some(3L)) ==
      Seq(Map("id" -> 2L, "v" -> "mid", "score" -> 7)))
    val beforeSwitch = s.currentOffset
    assert(s.firstDdlOffset(base, Long.MaxValue).isEmpty, "no DDL before the switch")
    val switchLsn = s.enableNewCaptureInstance()
    assert(s.firstDdlOffset(beforeSwitch, s.currentOffset).exists(_._1 == switchLsn.value))
    // post-switch: the new instance captures the full shape
    s.commitTx(Seq(DataChangeEvent.update(
      tid, Map("id" -> 3L), Map("id" -> 3L, "v" -> "post", "score" -> 9))))
    s.runCaptureJob()
    val events = s.readLog(base, s.currentOffset)
      .map(_.event.asInstanceOf[DataChangeEvent]).filter(_.op == OperationType.UPDATE)
    assert(events.map(_.after) == Seq(
      Map("id" -> 1L, "v" -> "pre"),
      Map("id" -> 2L, "v" -> "mid"), // score silently dropped — the window
      Map("id" -> 3L, "v" -> "post", "score" -> 9)))
    // a second migration before the first switch completes is rejected
    s.alterTable(AddColumnEvent(tid,
      Seq(AddColumnEvent.ColumnWithPosition("w", CdcTypes.StringT()))))
    intercept[IllegalArgumentException](s.alterTable(DropColumnEvent(tid, Seq("w"))))
  }

  test("the switch refuses to jump past uncaptured txs (they would be silently skipped)") {
    val s = newSource()
    s.alterTable(AddColumnEvent(tid,
      Seq(AddColumnEvent.ColumnWithPosition("score", CdcTypes.IntT()))))
    s.commitTx(Seq(upd(1L, "pending")))
    intercept[IllegalArgumentException](s.enableNewCaptureInstance())
    s.runCaptureJob()
    s.enableNewCaptureInstance() // clean switch after the job
  }

  test("PK-changing update removes the old key from the base table") {
    val s = newSource()
    s.commitTx(Seq(DataChangeEvent.update(
      tid, Map("id" -> 7L), Map("id" -> 77L, "v" -> "moved"))))
    assert(s.snapshotRead(Some(7L), Some(8L)).isEmpty)
    assert(s.snapshotRead(Some(77L), Some(78L)) == Seq(Map("id" -> 77L, "v" -> "moved")))
  }
}
