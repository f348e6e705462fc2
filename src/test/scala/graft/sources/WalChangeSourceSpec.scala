package graft.sources

import graft.core._
import graft.sources.postgres.{Lsn, Wal2Json, WalChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class WalChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("public.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource(full: Boolean = false) =
    new WalChangeSource(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")),
      replicaIdentityFull = full)

  test("Lsn: X/X parse-format round trip, invalid forms, unsigned order") {
    for (s <- Seq("0/15D68C50", "16/3002D50", "FFFFFFFF/FFFFFFFF", "0/1")) {
      val l = Lsn.parse(s)
      assert(l.isValid && Lsn.parse(l.asString) == l)
    }
    assert(Lsn.parse("nonsense") == Lsn.Invalid)
    assert(Lsn.parse("/123") == Lsn.Invalid)
    assert(Lsn.parse("0/0") == Lsn.Invalid) // zero can't address a record
    assert(Lsn.parse("1/0") > Lsn.parse("0/FFFFFFFF"))
    // top-bit-set LSNs still order after everything (unsigned compare)
    assert(Lsn.parse("FFFFFFFF/0") > Lsn.parse("7FFFFFFF/0"))
  }

  test("wal2json: parse/render round trip for insert/update/delete") {
    val changes = Seq(
      DataChangeEvent.insert(tid, Map("id" -> 1L, "v" -> "a\"quote")),
      DataChangeEvent.update(tid, Map("id" -> 2L), Map("id" -> 2L, "v" -> "b")),
      DataChangeEvent.delete(tid, Map("id" -> 3L)))
    val line = Wal2Json.renderLine(Lsn.parse("0/16D6E18"), 563L, 1700000000000L, changes)
    val tx = Wal2Json.parseLine(line)
    assert(tx.nextLsn.contains(Lsn.parse("0/16D6E18")))
    assert(tx.xid == 563L && tx.tsMillis == 1700000000000L)
    assert(tx.changes.map(_.op) ==
      Seq(OperationType.INSERT, OperationType.UPDATE, OperationType.DELETE))
    assert(tx.changes.head.after == Map("id" -> 1L, "v" -> "a\"quote"))
    assert(tx.changes(1).before == Map("id" -> 2L)) // oldkeys = key only
    assert(tx.changes(2).before == Map("id" -> 3L))
  }

  test("LSN offsets are sparse and strictly monotone; log reads by range") {
    val s = newSource()
    val base = s.currentOffset
    val c1 = s.commitTx(Seq(
      DataChangeEvent.update(tid, Map("id" -> 1L), Map("id" -> 1L, "v" -> "x")),
      DataChangeEvent.update(tid, Map("id" -> 2L), Map("id" -> 2L, "v" -> "y"))))
    val c2 = s.commitTx(Seq(
      DataChangeEvent.update(tid, Map("id" -> 3L), Map("id" -> 3L, "v" -> "z"))))
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 3)
    val offs = recs.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
    // content-sized strides, never unit: dense-offset assumptions would break
    assert(offs.zip(offs.tail).forall { case (a, b) => b - a > 1 })
    // a tx's commit position is its LAST record's LSN
    assert(offs(1) == c1.value && offs(2) == c2.value)
    // half-open range semantics identical to every other ChangeSource
    assert(s.readLog(offs(0), offs(1)).map(_.offset) == Seq(offs(1)))
  }

  test("replica identity: key-only before by default, full row under FULL") {
    val s = newSource()
    s.commitTx(Seq(DataChangeEvent.update(
      tid, Map("id" -> 1L, "v" -> "init"), Map("id" -> 1L, "v" -> "x"))))
    s.commitTx(Seq(DataChangeEvent.delete(tid, Map("id" -> 2L, "v" -> "init"))))
    val recs = s.readLog(0L, s.currentOffset)
      .collect { case graft.sources.cdc.LogRecord(_, _, e: DataChangeEvent) => e }
    assert(recs.head.before == Map("id" -> 1L)) // v stripped
    assert(recs(1).before == Map("id" -> 2L))
    assert(recs.head.meta.contains("lsn") && recs.head.meta.contains("txId"))

    val f = newSource(full = true)
    f.commitTx(Seq(DataChangeEvent.update(
      tid, Map("id" -> 1L, "v" -> "init"), Map("id" -> 1L, "v" -> "x"))))
    val fr = f.readLog(0L, f.currentOffset)
      .collect { case graft.sources.cdc.LogRecord(_, _, e: DataChangeEvent) => e }
    assert(fr.head.before == Map("id" -> 1L, "v" -> "init"))
    // the live table applied the full change either way
    assert(f.snapshotRead(Some(1L), Some(2L)).head("v") == "x")
  }

  test("slot retention: confirmed flush recycles WAL; stale reads fail loudly") {
    val s = newSource()
    val base = s.currentOffset
    val c1 = s.commitTx(Seq(
      DataChangeEvent.update(tid, Map("id" -> 1L), Map("id" -> 1L, "v" -> "x"))))
    val c2 = s.commitTx(Seq(
      DataChangeEvent.update(tid, Map("id" -> 2L), Map("id" -> 2L, "v" -> "y"))))
    assert(s.retainedWalRecords == 2)

    s.commitOffset(c1.value)
    assert(s.confirmedFlushLsn == c1)
    assert(s.retainedWalRecords == 1) // WAL behind confirmed_flush recycled
    // reading from AT the confirmed position is the resume path: fine
    assert(s.readLog(c1.value, c2.value).size == 1)
    // reading from BEFORE it cannot be served — loud, not silently empty
    val e = intercept[IllegalArgumentException](s.readLog(base, c2.value))
    assert(e.getMessage.contains("recycled"))

    // only-forward guard (PostgresStreamFetchTask.java:152-155): a stale
    // commit never moves the slot backwards
    s.commitOffset(base)
    assert(s.confirmedFlushLsn == c1)
  }

  test("applyCapture: wal2json lines replay in commit order, nextlsn pins positions") {
    val s = newSource()
    val head = s.currentOffset
    val l1 = Wal2Json.renderLine(Lsn(head + 100000), 601L, 0L, Seq(
      DataChangeEvent.update(tid, Map("id" -> 1L), Map("id" -> 1L, "v" -> "c1"))))
    val l2 = Wal2Json.renderLine(Lsn(head + 200000), 602L, 0L, Seq(
      DataChangeEvent.insert(tid, Map("id" -> 50L, "v" -> "c2")),
      DataChangeEvent.delete(tid, Map("id" -> 2L))))
    val last = s.applyCapture(Seq(l1, l2))
    assert(last == Lsn(head + 200000)) // commit positions from the capture survive
    assert(s.currentOffset == head + 200000)
    val recs = s.readLog(head, s.currentOffset)
    assert(recs.size == 3 && recs.last.offset == head + 200000)
    // the live table reflects the replay (snapshot reads see it)
    assert(s.snapshotRead(Some(50L), Some(51L)).head("v") == "c2")
    assert(s.snapshotRead(Some(2L), Some(3L)).isEmpty)
    // out-of-order captures are rejected
    val stale = Wal2Json.renderLine(Lsn(head + 150000), 603L, 0L, Seq(
      DataChangeEvent.insert(tid, Map("id" -> 60L, "v" -> "x"))))
    intercept[IllegalArgumentException](s.applyCapture(Seq(stale)))
  }

  test("firstDdlOffset: None for data-only log; a captured TRUNCATE surfaces at its position") {
    val s = newSource()
    s.commitTx(Seq(DataChangeEvent.update(tid, Map("id" -> 1L), Map("id" -> 1L, "v" -> "x"))))
    assert(s.firstDdlOffset(0L, s.currentOffset).isEmpty)
    // a pgoutput capture tx carrying ddl: table empties, event logged at its LSN
    val preTrunc = s.currentOffset
    s.applyCaptureTxs(Seq(
      Wal2Json.Tx(None, 900L, 0L, Seq.empty, ddl = Seq(TruncateTableEvent(tid))),
      Wal2Json.Tx(None, 901L, 0L,
        Seq(DataChangeEvent.insert(tid, Map("id" -> 50L, "v" -> "post"))))))
    assert(s.snapshotRead(None, None) == Seq(Map("id" -> 50L, "v" -> "post")))
    val Some((at, ev)) = s.firstDdlOffset(preTrunc, s.currentOffset)
    assert(ev == Seq(TruncateTableEvent(tid)) && at > preTrunc && at < s.currentOffset)
    // in-range scan semantics: past the truncate there is no further ddl
    assert(s.firstDdlOffset(at, s.currentOffset).isEmpty)
  }
}
