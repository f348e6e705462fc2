package graft.pipeline

import graft.core._
import graft.operators._
import graft.sinks.DataSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composes a pipeline definition into a running dataflow — the Spark form of
  * `flink-cdc-composer/.../FlinkPipelineComposer.java:115-260`:
  *
  * {{{
  *   Source → Transform (pre+post) → SchemaEvolution (driver) → Route
  *          → PK-hash partition → Sink (batch write = flush barrier)
  * }}}
  *
  * In micro-batch execution the coordinator protocol disappears: schema events
  * ride the control path and are applied between batches
  * ([[SchemaEvolutionDriver]]), so only data rows shuffle.
  */
final class PipelineComposer(pdef: PipelineDef, sink: DataSink)(implicit spark: SparkSession) {

  val router = new TableIdRouter(pdef.routes)
  val evolution = new SchemaEvolutionDriver(
    pdef.schemaChangeBehavior,
    sink,
    includedTypes =
      if (pdef.sink.includeSchemaChanges.isEmpty) SchemaChangeEventType.values
      else SchemaChangeEventType.ValueSet(
        pdef.sink.includeSchemaChanges.map(s =>
          SchemaChangeEventType.withName(s.toUpperCase)): _*),
    excludedTypes = SchemaChangeEventType.ValueSet(
      pdef.sink.excludeSchemaChanges.map(s => SchemaChangeEventType.withName(s.toUpperCase)): _*))

  private def ruleFor(tableId: TableId): Option[TransformRule] =
    pdef.transforms.find(_.matches(tableId))

  /** Output schema of the transform for a source table — derived by running the
    * projection over an empty frame (Catalyst analysis gives the exact types).
    */
  def transformedSchema(tableId: TableId, source: TableSchema): TableSchema =
    ruleFor(tableId) match {
      case None => source
      case Some(rule) =>
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], source.struct)
        val out = TransformOp.applyToRows(empty, rule.copy(filter = None), Some(tableId))
        TableSchema(
          out.schema,
          primaryKeys = if (rule.primaryKeys.nonEmpty) rule.primaryKeys else source.primaryKeys,
          partitionKeys =
            if (rule.partitionKeys.nonEmpty) rule.partitionKeys else source.partitionKeys,
          options = source.options ++ rule.tableOptions)
    }

  /** Register source tables: transform schemas, route them, emit (possibly
    * merged) CreateTableEvents through the evolution driver to the sink.
    */
  def createTables(sourceSchemas: Map[TableId, TableSchema]): Unit = {
    val transformed = sourceSchemas.map { case (t, s) => t -> transformedSchema(t, s) }
    // group by routed sink table; merge schemas of co-routed tables
    val bySink = transformed.toSeq
      .flatMap { case (t, s) => router.route(t).map(sinkT => (sinkT, t, s)) }
      .groupBy(_._1)
    bySink.toSeq.sortBy(_._1.identifier).foreach { case (sinkT, group) =>
      val schemas = group.map(_._3)
      val create =
        if (schemas.size == 1) CreateTableEvent(sinkT, schemas.head)
        else SchemaDerivator.mergedCreateTable(sinkT, schemas)
      evolution.handle(create)
    }
  }

  /** Process one batch of envelope data for one source table: transform →
    * route (fanout) → coerce to each sink table's evolved schema → materialize
    * upserts+deletes → write. `batchId` (when ≥ 0, from `foreachBatch`) lets
    * batch-id-tracking sinks skip replayed micro-batches; `runId` (the
    * checkpoint identity) scopes the skip to THIS logical run.
    */
  def processBatch(
      tableId: TableId, env: DataFrame, batchId: Long = -1L, runId: String = ""): Unit = {
    val transformed = ruleFor(tableId) match {
      case Some(rule) => EnvelopeTransform(env, rule, tableId)
      case None => env
    }
    router.route(tableId).foreach { sinkT =>
      val sinkSchema = sink
        .schemaOf(sinkT)
        .orElse(evolution.evolvedSchemas.latest(sinkT))
        .getOrElse(throw new IllegalStateException(s"sink table $sinkT not created"))
      val coerced = SchemaDerivator.coerceEnvelope(transformed, sinkSchema.struct)
      sink match {
        case cs: graft.sinks.ChangelogSink =>
          // log-shaped sink: every event reaches the wire, no materialization
          cs.writeChangelog(sinkT, coerced, batchId, runId)
        case _ =>
          val keys =
            if (sinkSchema.primaryKeys.nonEmpty) sinkSchema.primaryKeys
            else sinkSchema.struct.fieldNames.toSeq
          Upsert.withMaterialized(coerced, keys) { (upserts, deletes) =>
            sink.writeBatch(sinkT, upserts, deletes, batchId, runId)
          }
      }
    }
  }

  /** Handle a schema-change event on the control path (between batches). */
  def processSchemaChange(event: SchemaChangeEvent): Seq[SchemaChangeEvent] = {
    // route the event to each sink table it affects
    router.route(event.tableId).flatMap { sinkT =>
      val routed: SchemaChangeEvent = reRoute(event, sinkT)
      evolution.handle(routed)
    }
  }

  private def reRoute(e: SchemaChangeEvent, to: TableId): SchemaChangeEvent = e match {
    case ev: CreateTableEvent => ev.copy(tableId = to)
    case ev: AddColumnEvent => ev.copy(tableId = to)
    case ev: DropColumnEvent => ev.copy(tableId = to)
    case ev: RenameColumnEvent => ev.copy(tableId = to)
    case ev: AlterColumnTypeEvent => ev.copy(tableId = to)
    case ev: DropTableEvent => ev.copy(tableId = to)
    case ev: TruncateTableEvent => ev.copy(tableId = to)
  }
}

object PipelineComposer {
  /** Split a mixed-table envelope batch by tableId (driver-side distinct is a
    * tiny metadata query; the per-table frames stay lazy).
    */
  def splitByTable(env: DataFrame): Map[TableId, DataFrame] = {
    val ids = env.select(Envelope.TableIdCol).distinct()
      .collect().map(_.getString(0))
    ids.map(id => TableId.parse(id) -> env.filter(col(Envelope.TableIdCol) === id)).toMap
  }
}
