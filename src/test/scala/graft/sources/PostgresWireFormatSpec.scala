package graft.sources

import graft.SparkTestBase
import graft.operators.Envelope
import graft.sinks.KafkaJsonFormats
import graft.sources.postgres.PostgresWireFormat
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PostgresWireFormatSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rowT = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  // docs-style Debezium Postgres records: a schema-wrapped snapshot read, a
  // bare update, a delete, plus garbage and a tombstone line
  private val captured = Seq(
    """{"schema":{"type":"struct","optional":false},"payload":{"before":null,"after":{"id":1,"name":"anne"},"source":{"version":"2.4.0.Final","connector":"postgresql","name":"dbserver1","ts_ms":1700000000000,"snapshot":"true","db":"postgres","schema":"public","table":"customers","txId":555,"lsn":23500000,"xmin":null},"op":"r","ts_ms":1700000000123}}""",
    """{"before":{"id":1,"name":"anne"},"after":{"id":1,"name":"anne marie"},"source":{"version":"2.4.0.Final","connector":"postgresql","name":"dbserver1","ts_ms":1700000001000,"snapshot":"false","db":"postgres","schema":"public","table":"customers","txId":556,"lsn":23500552,"xmin":null},"op":"u","ts_ms":1700000001042}""",
    """{"before":{"id":2,"name":"bob"},"after":null,"source":{"version":"2.4.0.Final","connector":"postgresql","name":"dbserver1","ts_ms":1700000002000,"snapshot":"false","db":"postgres","schema":"public","table":"customers","txId":557,"lsn":23501176,"xmin":null},"op":"d","ts_ms":1700000002005}""",
    """not json at all""",
    """   """)

  test("parses Postgres wire records: LSN sequence, three-part id, op decode") {
    val out = PostgresWireFormat.parse(captured.toDF("value"), rowT)
      .orderBy(Envelope.SeqCol).collect()
    assert(out.length == 4) // tombstone dropped, garbage kept as INVALID
    val valid = out.filter(_.getString(1) != KafkaJsonFormats.InvalidOp)
    assert(valid.map(_.getString(1)).toSeq == Seq("REPLACE", "UPDATE", "DELETE"))
    // three-part identity and the LSN as the sequence, verbatim
    assert(valid.forall(_.getString(0) == "postgres.public.customers"))
    assert(valid.map(_.getLong(4)).toSeq == Seq(23500000L, 23500552L, 23501176L))
    val meta = valid(1).getMap[String, String](5)
    assert(meta("lsn") == "23500552" && meta("txId") == "556" &&
      meta("snapshot") == "false")
  }

  test("wireValue round trip is lossless, including snapshot 'r' and nulls") {
    import org.apache.spark.sql.functions._
    val env = Seq(
      ("db1.public.t", "INSERT", null.asInstanceOf[(Long, String)], (1L, "a"), 10L),
      ("db1.public.t", "UPDATE", (1L, "a"), (1L, "b"), 20L),
      ("db1.public.t", "REPLACE", null.asInstanceOf[(Long, String)], (2L, "c"), 30L),
      ("db1.public.t", "DELETE", (2L, "c"), null.asInstanceOf[(Long, String)], 40L))
      .toDF("tid", "o", "b", "a", "sq")
      .select(
        col("tid").as(Envelope.TableIdCol), col("o").as(Envelope.OpCol),
        col("b").cast("struct<id:bigint,name:string>").as(Envelope.BeforeCol),
        col("a").cast("struct<id:bigint,name:string>").as(Envelope.AfterCol),
        col("sq").as(Envelope.SeqCol),
        map().cast("map<string,string>").as(Envelope.MetaCol))
    val wire = env.select(
      PostgresWireFormat.wireValue(lsn = col(Envelope.SeqCol) * 100).as("value"))
    val back = PostgresWireFormat.parse(wire, rowT).orderBy(Envelope.SeqCol).collect()
    assert(back.map(_.getString(1)).toSeq == Seq("INSERT", "UPDATE", "REPLACE", "DELETE"))
    assert(back.map(_.getLong(4)).toSeq == Seq(1000L, 2000L, 3000L, 4000L))
    assert(back.forall(_.getString(0) == "db1.public.t"))
    assert(back(1).getStruct(2).getString(1) == "a" &&
      back(1).getStruct(3).getString(1) == "b")
    assert(back(3).getStruct(3) == null) // delete: no after image
  }
}
