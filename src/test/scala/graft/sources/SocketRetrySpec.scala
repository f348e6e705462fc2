package graft.sources

import graft.core._
import graft.sources.mongo.{DocumentChangeSource, MongoServerDouble, MongoSocketChangeSource}
import graft.sources.mysql.{BinlogServerDouble, BinlogSocketChangeSource}
import graft.sources.postgres.{PgReplicationServerDouble, PgSocketChangeSource, WalChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Transient network failure mid-dump, for all three socket families: the
  * session is a pure pull, so the reader retries the whole window
  * idempotently ([[graft.sources.cdc.WireRetry]]) — two injected
  * connection drops still yield the complete, unduplicated record set; a
  * failure on every attempt surfaces loudly; and a PERMANENT protocol
  * refusal (recycled WAL) is NOT retried into a slow failure.
  */
class SocketRetrySpec extends AnyFunSuite {

  private val pkSchema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  test("binlog: two mid-dump deaths, then a complete read; all-fail is loud") {
    val t = TableId.parse("app.users")
    val double = new BinlogServerDouble(t, pkSchema, Seq.empty)
    double.start()
    try {
      val src = new BinlogSocketChangeSource(double)
      (0L until 10L).foreach(i => double.commitTx(Seq(
        DataChangeEvent.insert(t, Map[String, Any]("id" -> i, "v" -> s"v$i")))))
      val want = src.readLog(0L, src.currentOffset)
      assert(want.size == 10)
      double.failNextSessions(2)
      val before = double.dumpSessionCount
      val got = src.readLog(0L, src.currentOffset)
      assert(got == want, "two transient deaths must not lose or duplicate records")
      assert(double.dumpSessionCount - before == 3, "two failed + one clean session")
      double.failNextSessions(3) // >= the retry budget: every attempt dies
      intercept[Exception] { src.readLog(0L, src.currentOffset) }
      double.failNextSessions(0)
    } finally double.stop()
  }

  test("walsender: two mid-CopyBoth deaths, then a complete read; refusal is not retried") {
    val t = TableId.parse("public.users")
    val wal = new WalChangeSource(t, pkSchema, Seq.empty)
    val double = new PgReplicationServerDouble(wal)
    double.start()
    try {
      val src = new PgSocketChangeSource(double)
      (0L until 10L).foreach(i => wal.commitTx(Seq(
        DataChangeEvent.insert(t, Map[String, Any]("id" -> i, "v" -> s"v$i")))))
      val want = src.readLog(0L, src.currentOffset)
      assert(want.size == 10)
      double.failNextSessions(2)
      val before = double.sessionCount
      val got = src.readLog(0L, src.currentOffset)
      assert(got == want, "two transient deaths must not lose or duplicate records")
      assert(double.sessionCount - before == 3, "two failed + one clean session")
      // a recycled-WAL refusal is a permanent answer — it must fail FAST
      // (one session), not burn the retry budget
      src.commitOffset(want(4).offset)
      val before2 = double.sessionCount
      val e = intercept[IllegalStateException] { src.readLog(0L, src.currentOffset) }
      assert(e.getMessage.contains("58P01"))
      assert(double.sessionCount - before2 == 1, "protocol refusals are not retried")
    } finally double.stop()
  }

  test("change stream: two aggregate deaths, then a complete read") {
    val t = TableId.parse("appdb.items")
    val mongo = new DocumentChangeSource(t, Seq.empty)
    val double = new MongoServerDouble(mongo)
    double.start()
    try {
      val src = new MongoSocketChangeSource(double)
      (0L until 10L).foreach(i => mongo.insertDoc(i, s"""{"v": $i}"""))
      val want = src.readLog(0L, src.currentOffset)
      assert(want.size == 10)
      double.failNextSessions(2)
      val before = double.sessionCount
      val got = src.readLog(0L, src.currentOffset)
      assert(got == want, "two transient deaths must not lose or duplicate records")
      assert(double.sessionCount - before == 3, "two failed + one clean session")
    } finally double.stop()
  }
}
