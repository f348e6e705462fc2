package graft.sources

import graft.SparkTestBase
import graft.core.{AddColumnEvent, CreateTableEvent}
import graft.operators.Envelope
import graft.sinks.KafkaJsonFormats
import graft.sources.debezium.DebeziumFileSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DebeziumFileSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rowT = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  // verbatim-shaped Debezium MySQL records (docs-style layout): a
  // schema-wrapped snapshot read, a bare-payload update, a delete, plus a
  // garbage line and a blank tombstone line
  private val captured = Seq(
    """{"schema":{"type":"struct","optional":false},"payload":{"before":null,"after":{"id":1,"name":"anne"},"source":{"version":"2.4.0.Final","connector":"mysql","name":"dbserver1","ts_ms":1700000000000,"snapshot":"true","db":"inventory","table":"customers","server_id":0,"gtid":null,"file":"mysql-bin.000003","pos":154,"row":0},"op":"r","ts_ms":1700000000123}}""",
    """{"before":{"id":1,"name":"anne"},"after":{"id":1,"name":"anne marie"},"source":{"version":"2.4.0.Final","connector":"mysql","name":"dbserver1","ts_ms":1700000001000,"snapshot":"false","db":"inventory","table":"customers","server_id":223344,"gtid":null,"file":"mysql-bin.000003","pos":401,"row":0},"op":"u","ts_ms":1700000001042}""",
    """{"before":{"id":2,"name":"bob"},"after":null,"source":{"version":"2.4.0.Final","connector":"mysql","name":"dbserver1","ts_ms":1700000002000,"snapshot":"false","db":"inventory","table":"customers","server_id":223344,"gtid":null,"file":"mysql-bin.000004","pos":77,"row":1},"op":"d","ts_ms":1700000002005}""",
    """not json at all""",
    """   """)

  test("parses schema-wrapped and bare captured records uniformly") {
    val out = DebeziumFileSource.parse(captured.toDF("value"), rowT)
      .orderBy(Envelope.SeqCol).collect()
    // blank tombstone dropped; garbage kept as INVALID
    assert(out.length == 4)
    val byOp = out.map(r => r.getString(1)).toSeq
    assert(byOp.contains(KafkaJsonFormats.InvalidOp))
    val valid = out.filter(_.getString(1) != KafkaJsonFormats.InvalidOp)
    assert(valid.map(_.getString(1)).toSeq == Seq("REPLACE", "UPDATE", "DELETE"))
    assert(valid.forall(_.getString(0) == "inventory.customers"))
    // snapshot read: after image only
    val snap = valid(0)
    assert(snap.getStruct(3).getString(1) == "anne" && snap.getStruct(2) == null)
    // update: both images
    val upd = valid(1)
    assert(upd.getStruct(2).getString(1) == "anne" &&
      upd.getStruct(3).getString(1) == "anne marie")
    // meta carries the binlog coordinates
    val meta = upd.getMap[String, String](5)
    assert(meta("file") == "mysql-bin.000003" && meta("pos") == "401" &&
      meta("snapshot") == "false")
  }

  test("binlogSeq orders across file rollover: (file, pos, row) total order") {
    val out = DebeziumFileSource.parse(captured.toDF("value"), rowT)
      .filter(col(Envelope.OpCol) =!= KafkaJsonFormats.InvalidOp)
      .select(col(Envelope.SeqCol)).as[Long].collect().toSeq
    // file 3 pos 154 < file 3 pos 401 < file 4 pos 77(+row 1)
    assert(out.sorted == out)
    assert(out(0) == 3L * (1L << 40) + 154 &&
      out(1) == 3L * (1L << 40) + 401 &&
      out(2) == 4L * (1L << 40) + 77 + 1)
  }

  test("wireValue -> parse round trip is lossless incl. snapshot flag") {
    val env = Seq(
      ("app.users", "REPLACE", null.asInstanceOf[(Long, String)], (1L, "a"), 10L),
      ("app.users", "UPDATE", (1L, "a"), (1L, "b"), 11L),
      ("app.users", "DELETE", (1L, "b"), null.asInstanceOf[(Long, String)], 12L))
      .toDF(Envelope.TableIdCol, Envelope.OpCol, Envelope.BeforeCol,
        Envelope.AfterCol, Envelope.SeqCol)
      .withColumn(Envelope.MetaCol, map().cast("map<string,string>"))
      .withColumn(Envelope.BeforeCol, col(Envelope.BeforeCol).cast(
        "struct<id:bigint,name:string>"))
      .withColumn(Envelope.AfterCol, col(Envelope.AfterCol).cast(
        "struct<id:bigint,name:string>"))
    val wire = env.select(DebeziumFileSource.wireValue().as("value"))
    val back = DebeziumFileSource.parse(wire, rowT).orderBy(Envelope.SeqCol).collect()
    assert(back.map(_.getString(1)).toSeq == Seq("REPLACE", "UPDATE", "DELETE"))
    // seq reconstructed from the binlog coordinates embeds the original pos
    assert(back.map(_.getLong(4)).toSeq == Seq(10, 11, 12).map(1L * (1L << 40) + _))
    assert(back(1).getStruct(2).getString(1) == "a" &&
      back(1).getStruct(3).getString(1) == "b")
    val meta = back(0).getMap[String, String](5)
    assert(meta("snapshot") == "true") // REPLACE rode op 'r' + snapshot flag
  }

  test("readSchemaChanges: schema-history lines -> ordered DDL events with db context") {
    val dir = java.nio.file.Files.createTempDirectory("dbz_hist")
    val lines = Seq(
      // schema-wrapped, later binlog position — must sort SECOND
      """{"schema":{},"payload":{"source":{"file":"mysql-bin.000002","pos":10,"row":0},"databaseName":"inventory","ddl":"ALTER TABLE customers ADD COLUMN email VARCHAR(255)"}}""",
      """{"source":{"file":"mysql-bin.000001","pos":5,"row":0},"databaseName":"inventory","ddl":"CREATE TABLE customers (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(64))"}""")
    java.nio.file.Files.write(dir.resolve("history.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val events = DebeziumFileSource.readSchemaChanges(spark, dir.toString)
    assert(events.length == 2)
    val create = events.head.asInstanceOf[CreateTableEvent]
    assert(create.tableId.toString == "inventory.customers")
    assert(create.schema.primaryKeys == Seq("id"))
    val add = events(1).asInstanceOf[AddColumnEvent]
    assert(add.tableId.toString == "inventory.customers")
  }
}
