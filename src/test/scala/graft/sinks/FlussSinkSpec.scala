package graft.sinks

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fluss sink: the table-duality contract (PK upsert vs append-log with
  * server-assigned offsets), the async-ack flush barrier, and offset-based
  * log scans against the loopback double. */
class FlussSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val tid = TableId.parse("app.users")
  private val pkSchema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))
  private val logSchema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq.empty)

  test("primary-key table: upserts and deletes land as final state") {
    val server = new MockFlussServer
    try {
      val sink = new FlussSink(server.url(), buckets = 2)
      sink.applySchemaChange(CreateTableEvent(tid, pkSchema))
      sink.writeBatch(tid, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
        spark.range(0).select($"id"))
      sink.writeBatch(tid, Seq((2L, "b2")).toDF("id", "v"), Seq(3L).toDF("id"))
      val rows = server.rowsOf("fluss", "users").toMap
      assert(rows.keySet == Set("1", "2"))
      assert(rows("2").contains(""""v":"b2""""))
      assert(server.logSizeOf("fluss", "users") == 0L, "PK tables do not append")
    } finally server.stop()
  }

  test("append-log table: every row appends; offsets are monotone per bucket") {
    val server = new MockFlussServer
    try {
      val sink = new FlussSink(server.url(), buckets = 2)
      sink.applySchemaChange(CreateTableEvent(tid, logSchema))
      sink.writeBatch(tid, (0L until 50L).toDF("id")
        .select($"id", concat(lit("v"), $"id").as("v")),
        spark.range(0).select($"id"))
      // duplicate ids APPEND — a log table has no keys to collapse
      sink.writeBatch(tid, Seq((1L, "again")).toDF("id", "v"),
        spark.range(0).select($"id"))
      assert(server.logSizeOf("fluss", "users") == 51L)
      assert(server.rowsOf("fluss", "users").isEmpty, "log tables have no PK store")
      val client = new FlussClient(server.url())
      (0 until 2).foreach { b =>
        val recs = client.scanLog("fluss", "users", b, 0L)
        assert(recs.map(_._1) == recs.indices.map(_.toLong),
          s"bucket $b offsets are dense and monotone from 0")
        // a scan from a mid-offset resumes exactly there
        if (recs.size > 2) {
          val tail = client.scanLog("fluss", "users", b, 2L)
          assert(tail == recs.drop(2))
        }
      }
    } finally server.stop()
  }

  test("async window: many rows, bounded in-flight, every ack drained") {
    val server = new MockFlussServer
    try {
      val sink = new FlussSink(server.url(), buckets = 2, maxInFlight = 3)
      sink.applySchemaChange(CreateTableEvent(tid, pkSchema))
      // 500 keys through a 3-deep async window: if the flush barrier
      // failed to drain, rows would be missing after writeBatch returns
      sink.writeBatch(tid, (0L until 500L).toDF("id")
        .select($"id", concat(lit("v"), $"id").as("v")),
        spark.range(0).select($"id"))
      assert(server.rowsOf("fluss", "users").size == 500)
    } finally server.stop()
  }

  test("duality is enforced: append on a PK table / upsert on a log table refuse") {
    val server = new MockFlussServer
    try {
      val client = new FlussClient(server.url())
      client.createTable("fluss", "pk", Seq("id"), Seq("id"), 1)
      client.createTable("fluss", "log", Seq("id"), Seq.empty, 1)
      val e1 = intercept[java.io.IOException](
        client.writeAsync("fluss", "pk", "append",
          Iterator("""{"id":"1"}"""), 1))
      assert(e1.getMessage.contains("append on a primary-key table"))
      val e2 = intercept[java.io.IOException](
        client.writeAsync("fluss", "log", "upsert",
          Iterator("""{"id":"1"}"""), 1))
      assert(e2.getMessage.contains("upsert on a log table"))
    } finally server.stop()
  }
}
