package graft.streaming

import graft.SparkTestBase
import graft.core._
import graft.pipeline._
import graft.sinks.MemoryDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class CdcStreamSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  test("streaming envelope -> foreachBatch composer -> memory sink (flush barrier)") {
    import graft.operators.Envelope
    val t = TableId.parse("db.t")
    val schema = ValuesSource.customersSchema
    val envSchema = Envelope.envelopeSchema(schema.struct)

    val pdef = PipelineDef(SourceDef("values", None, Map.empty),
      SinkDef("values", None, Map.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t -> schema))

    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(envSchema))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Row]

    def envRows(events: Seq[DataChangeEvent], seqBase: Long): Seq[Row] =
      events.zipWithIndex.map { case (e, i) =>
        def rowOf(m: Map[String, Any]): Row =
          if (m.isEmpty) null
          else Row.fromSeq(schema.struct.fieldNames.toSeq.map(n => m.getOrElse(n, null)))
        Row(e.tableId.identifier, e.op.toString, rowOf(e.before), rowOf(e.after),
          seqBase + i, Map.empty[String, String])
      }

    // batch 1: three inserts
    stream.addData(envRows(Seq(
      DataChangeEvent.insert(t, Map("col1" -> "1", "col2" -> "a")),
      DataChangeEvent.insert(t, Map("col1" -> "2", "col2" -> "b")),
      DataChangeEvent.insert(t, Map("col1" -> "3", "col2" -> "c"))), 0))
    val q1 = CdcStream.start(stream.toDF(), composer, queryName = "cdc-test-1")
    q1.processAllAvailable(); q1.stop()
    assert(sink.rowsOf(t).size == 3)

    // schema change between batches (micro-batch boundary = flush barrier)
    composer.processSchemaChange(
      AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("col3",
        CdcTypes.StringT()))))

    // batch 2: update + delete in the old shape still coerce
    stream.addData(envRows(Seq(
      DataChangeEvent.update(t, Map("col1" -> "1", "col2" -> "a"),
        Map("col1" -> "1", "col2" -> "A")),
      DataChangeEvent.delete(t, Map("col1" -> "2", "col2" -> "b"))), 10))
    val q2 = CdcStream.start(stream.toDF(), composer, queryName = "cdc-test-2")
    q2.processAllAvailable(); q2.stop()

    val rows = sink.rowsOf(t).map(_.mkString(",")).sorted
    assert(rows == Seq("1,A,null", "3,c,null"))
  }
}
