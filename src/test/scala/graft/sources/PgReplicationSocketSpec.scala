package graft.sources

import graft.core._
import graft.sources.postgres.{Lsn, PgReplicationClient, PgReplicationServerDouble,
  PgSocketChangeSource, WalChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The replication-socket double at the wire level: dump parity with the
  * in-process WAL read, confirmed_flush advancement through a real
  * standby-status-update frame, and the recycled-WAL refusal as a real
  * ErrorResponse — the slot semantics of `c_postgres_wire`, spoken in
  * protocol. */
class PgReplicationSocketSpec extends AnyFunSuite {

  private val tid = TableId.parse("public.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newDouble() = {
    val wal = new WalChangeSource(tid, schema,
      (0L until 10L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))
    val d = new PgReplicationServerDouble(wal)
    d.start()
    d
  }

  test("socket dump equals the in-process WAL read, record for record") {
    val d = newDouble()
    try {
      val wal = d.wal
      wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 100L, "v" -> "a")),
        DataChangeEvent.update(tid, Map("id" -> 3L, "v" -> "init"), Map("id" -> 3L, "v" -> "b"))))
      wal.commitTx(Seq(
        DataChangeEvent.delete(tid, Map("id" -> 5L, "v" -> "init"))))
      val inProc = wal.readLog(0L, wal.currentOffset)
      val wire = PgReplicationClient.dump(
        "127.0.0.1", d.port, wal.slotName, tid.schemaName,
        fromLsn = 0L, flushedLsn = 0L)
      assert(wire.map(_.offset) == inProc.map(_.offset))
      assert(wire == inProc, "wire decode must equal the in-process read " +
        "(ops, identity-trimmed images, lsn/txId metadata)")
    } finally d.stop()
  }

  test("dump from a mid-log LSN serves only the suffix") {
    val d = newDouble()
    try {
      val wal = d.wal
      val mid = wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 200L, "v" -> "x")))).value
      wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 201L, "v" -> "y"))))
      val wire = PgReplicationClient.dump(
        "127.0.0.1", d.port, wal.slotName, tid.schemaName,
        fromLsn = mid, flushedLsn = 0L)
      assert(wire.size == 1)
      assert(wire.head.event.asInstanceOf[DataChangeEvent].after("id") == 201L)
    } finally d.stop()
  }

  test("standby status update advances confirmed_flush and trims retained WAL") {
    val d = newDouble()
    try {
      val wal = d.wal
      val first = wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 300L, "v" -> "x"))))
      wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 301L, "v" -> "y"))))
      assert(wal.retainedWalRecords == 2)
      val src = new PgSocketChangeSource(d)
      src.commitOffset(first.value) // a real session, a real 'r' frame
      assert(wal.confirmedFlushLsn == first)
      assert(wal.retainedWalRecords == 1, "WAL behind confirmed_flush is recycled")
    } finally d.stop()
  }

  test("starting behind confirmed_flush is refused with a wire error") {
    val d = newDouble()
    try {
      val wal = d.wal
      val first = wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 400L, "v" -> "x"))))
      wal.commitTx(Seq(
        DataChangeEvent.insert(tid, Map("id" -> 401L, "v" -> "y"))))
      new PgSocketChangeSource(d).commitOffset(first.value)
      val e = intercept[IllegalStateException] {
        PgReplicationClient.dump(
          "127.0.0.1", d.port, wal.slotName, tid.schemaName,
          fromLsn = 0L, flushedLsn = 0L)
      }
      assert(e.getMessage.contains("58P01"), s"expected the WAL-removed code: ${e.getMessage}")
      assert(e.getMessage.contains("recycled"), s"expected the slot message: ${e.getMessage}")
    } finally d.stop()
  }

  test("unknown slot is refused") {
    val d = newDouble()
    try {
      val e = intercept[IllegalStateException] {
        PgReplicationClient.dump(
          "127.0.0.1", d.port, "not_a_slot", tid.schemaName,
          fromLsn = 0L, flushedLsn = 0L)
      }
      assert(e.getMessage.contains("does not exist"))
    } finally d.stop()
  }
}
