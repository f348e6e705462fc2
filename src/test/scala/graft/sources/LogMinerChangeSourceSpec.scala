package graft.sources

import graft.core._
import graft.sources.oracle.LogMinerChangeSource
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class LogMinerChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("scott.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource() =
    new LogMinerChangeSource(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))

  test("uncommitted entries are mined but emit nothing, and snapshot reads keep read consistency") {
    val s = newSource()
    val base = s.currentOffset
    val tx = s.begin()
    tx.update(Map("id" -> 1L), Map("id" -> 1L, "v" -> "x"))
    assert(s.minedEntryCount == 1) // the redo stream HAS the entry
    assert(s.currentOffset == base) // but the head never moves pre-commit
    assert(s.readLog(base, Long.MaxValue).isEmpty)
    // read consistency: the committed table is untouched
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "init")))
    tx.commit()
    assert(s.currentOffset > base)
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "x")))
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 1 && recs.head.event.asInstanceOf[DataChangeEvent].after("v") == "x")
  }

  test("rollback discards the transaction's buffered entries forever") {
    val s = newSource()
    val base = s.currentOffset
    val bad = s.begin()
    bad.update(Map("id" -> 2L), Map("id" -> 2L, "v" -> "POISON"))
    val good = s.begin()
    good.update(Map("id" -> 3L), Map("id" -> 3L, "v" -> "ok"))
    bad.rollback()
    good.commit()
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 1)
    assert(recs.head.event.asInstanceOf[DataChangeEvent].after("v") == "ok")
    assert(s.snapshotRead(Some(2L), Some(3L)) == Seq(Map("id" -> 2L, "v" -> "init")))
    intercept[IllegalArgumentException](bad.commit()) // closed
  }

  test("commit-order emission: interleaved entries emit by commit SCN, not entry SCN") {
    val s = newSource()
    val base = s.currentOffset
    val early = s.begin() // lower entry SCNs...
    early.update(Map("id" -> 1L), Map("id" -> 1L, "v" -> "early1"))
    val late = s.begin()
    late.update(Map("id" -> 2L), Map("id" -> 2L, "v" -> "late1"))
    early.update(Map("id" -> 3L), Map("id" -> 3L, "v" -> "early2"))
    late.commit() // ...but LATE commits first
    early.commit()
    val recs = s.readLog(base, s.currentOffset)
    val vs = recs.map(_.event.asInstanceOf[DataChangeEvent].after("v"))
    assert(vs == Seq("late1", "early1", "early2"))
    // offsets strictly monotone; entry SCN metadata shows the inversion
    val offs = recs.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
    val entryScns = recs.map(_.event.asInstanceOf[DataChangeEvent].meta("scn").toLong)
    assert(entryScns != entryScns.sorted, "entry SCNs must interleave across the commit order")
    assert(recs.map(_.event.asInstanceOf[DataChangeEvent].meta("xid")).distinct.size == 2)
  }

  test("restartScn reaches back to the oldest in-flight transaction's first entry") {
    val s = newSource()
    val inFlight = s.begin()
    inFlight.update(Map("id" -> 5L), Map("id" -> 5L, "v" -> "pending"))
    val quick = s.begin()
    quick.update(Map("id" -> 6L), Map("id" -> 6L, "v" -> "done"))
    quick.commit()
    assert(s.openTxCount == 1)
    assert(s.restartScn < (s.currentOffset >> 16),
      "with an open tx the restart window must predate the last commit")
    // a mid-restart window from the last commit still finds the in-flight
    // entries once committed: packed offsets sit ABOVE the old head
    val head = s.currentOffset
    inFlight.commit()
    val replay = s.readLog(head, s.currentOffset)
    assert(replay.size == 1 && replay.head.event.asInstanceOf[DataChangeEvent].after("v") == "pending")
    assert(s.restartScn == s.currentOffset >> 16 ||
      s.openTxCount == 0) // no open txs → restartScn is the head again
  }

  test("half-open ranges, offsetAtTimestamp, and DDL on the control path") {
    val s = newSource()
    val base = s.currentOffset
    val t1 = s.begin(); t1.update(Map("id" -> 1L), Map("id" -> 1L, "v" -> "a")); t1.commit(1000L)
    val t2 = s.begin(); t2.update(Map("id" -> 2L), Map("id" -> 2L, "v" -> "b")); t2.commit(2000L)
    val recs = s.readLog(base, s.currentOffset)
    assert(recs.size == 2)
    assert(s.readLog(recs(0).offset, recs(1).offset).map(_.offset) == Seq(recs(1).offset))
    val at = s.offsetAtTimestamp(1500L)
    assert(s.readLog(at, s.currentOffset).size == 1)
    // DDL mines as its own auto-committed operation, surfaced driver-cheap
    val ddlOff = s.ddl(AddColumnEvent(tid,
      Seq(AddColumnEvent.ColumnWithPosition("w", CdcTypes.StringT()))))
    assert(s.firstDdlOffset(recs(1).offset, s.currentOffset).exists(_._1 == ddlOff))
    assert(s.firstDdlOffset(ddlOff, Long.MaxValue).isEmpty)
  }
}
