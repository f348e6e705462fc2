package graft.sources

import graft.core._
import graft.operators.Envelope
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.JavaConverters._

/** Scripted in-memory event fixtures — the analog of
  * `flink-cdc-pipeline-connector-values/.../ValuesDataSourceHelper.java:52-540`
  * (SINGLE_SPLIT_SINGLE_TABLE etc.), used by composer tests the way the
  * reference's `FlinkPipelineComposerITCase` uses the values connector.
  */
object ValuesSource {

  /** Convert scripted [[DataChangeEvent]]s into an envelope DataFrame; `seq` is
    * the script position (the changelog order).
    */
  def toEnvelope(
      spark: SparkSession,
      schema: TableSchema,
      events: Seq[DataChangeEvent]): DataFrame = {
    val payload = schema.struct
    def rowOf(m: Map[String, Any]): Row =
      if (m.isEmpty) null
      else Row.fromSeq(payload.fieldNames.toSeq.map(n => m.getOrElse(n, null)))
    val rows = events.zipWithIndex.map { case (e, i) =>
      Row(
        e.tableId.identifier,
        e.op.toString,
        rowOf(e.before),
        rowOf(e.after),
        i.toLong,
        e.meta)
    }
    spark.createDataFrame(rows.asJava, Envelope.envelopeSchema(payload))
  }

  /** The reference's `SINGLE_SPLIT_SINGLE_TABLE` script
    * (`ValuesDataSourceHelper.singleSplitSingleTable`): one table, 3 inserts,
    * add-column, 2 more events, update, delete — trimmed to the data events
    * here; the schema events ride the control path.
    */
  def customersSchema: TableSchema = TableSchema(
    StructType(Seq(
      StructField("col1", StringType),
      StructField("col2", StringType))),
    primaryKeys = Seq("col1"))

  def singleTableScript(t: TableId): Seq[DataChangeEvent] = Seq(
    DataChangeEvent.insert(t, Map("col1" -> "1", "col2" -> "2")),
    DataChangeEvent.insert(t, Map("col1" -> "3", "col2" -> "4")),
    DataChangeEvent.insert(t, Map("col1" -> "5", "col2" -> "6")),
    DataChangeEvent.update(t, Map("col1" -> "1", "col2" -> "2"), Map("col1" -> "1", "col2" -> "x")),
    DataChangeEvent.delete(t, Map("col1" -> "3", "col2" -> "4")))
}
