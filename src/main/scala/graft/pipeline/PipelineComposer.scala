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
final class PipelineComposer(
    pdef: PipelineDef,
    sink: DataSink,
    // rename DDL history of the SOURCE feeding a table (ChangeSource
    // .renameHistory) — lets batch coercion bridge a sink that is one
    // rename behind the envelope's live schema (parked, not yet acked)
    renameHistoryFor: TableId => Seq[(Long, Map[String, String])] = _ => Seq.empty)(
    implicit spark: SparkSession) {

  val router = new TableIdRouter(pdef.routes)
  val evolution = new SchemaEvolutionDriver(
    pdef.schemaChangeBehavior,
    sink,
    // the reference's TAG grammar (family + dotted specific tags) — a plain
    // enum withName on "create.table" would throw before the pipeline starts
    includedTypes =
      if (pdef.sink.includeSchemaChanges.isEmpty) SchemaChangeEventType.values
      else SchemaChangeEventType.ValueSet(
        pdef.sink.includeSchemaChanges.flatMap(SchemaChangeEventType.ofTag): _*),
    excludedTypes = SchemaChangeEventType.ValueSet(
      pdef.sink.excludeSchemaChanges.flatMap(SchemaChangeEventType.ofTag): _*))

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

  /** Transformed source-table schemas — the UPSTREAM side of the reference
    * coordinator's two registries (`SchemaCoordinator` keys its redundancy
    * check and reverse lookups on upstream table ids, :364-379). Keyed by
    * SOURCE table id; the evolution driver's registries are sink-keyed.
    */
  private val upstreamSchemas = new SchemaManager

  /** Register source tables by running their CreateTableEvents through the
    * normal schema-change path — exactly how the reference's sources announce
    * tables (each emits a CreateTableEvent at snapshot start; the coordinator
    * deduces what the routed sink needs). Deterministic identifier order:
    * many-to-one merges key the sink on the FIRST source's primary keys, so
    * hash-map iteration order would flip the upsert key between runs.
    */
  def createTables(sourceSchemas: Map[TableId, TableSchema]): Unit =
    sourceSchemas.toSeq.sortBy(_._1.identifier).foreach { case (t, s) =>
      processSchemaChange(CreateTableEvent(t, s))
    }

  /** `SchemaCoordinator.deduceEvolvedSchemaChanges` (reference :258-340): a
    * sink table fed by ONE upstream table forwards the event verbatim; a
    * many-to-one (merged) sink re-derives the least-common schema over the
    * current evolved schema and ALL depending upstream schemas and emits the
    * DIFFERENCE (AlterColumnType widenings + appended AddColumns) — so a
    * rename on one shard of a merged sink surfaces as an ADD of the new
    * name, and a second shard's wider types arrive as widenings, never as a
    * re-CREATE.
    */
  private def deduceForSink(
      sinkT: TableId, projected: SchemaChangeEvent): Seq[SchemaChangeEvent] = {
    val upstreams = upstreamSchemas.knownTables
      .filter(u => router.route(u).contains(sinkT))
    if (upstreams.size <= 1) Seq(reRoute(projected, sinkT))
    else {
      val sources = upstreams.toSeq.sortBy(_.identifier)
        .flatMap(upstreamSchemas.latest)
      evolution.evolvedSchemas.latest(sinkT) match {
        case None => Seq(SchemaDerivator.mergedCreateTable(sinkT, sources))
        case Some(cur) =>
          val curCols = SchemaMerging.fromStruct(cur.struct)
          val merged = sources
            .map(s => SchemaMerging.fromStruct(s.struct))
            .foldLeft(curCols)(SchemaMerging.leastCommonSchema)
          SchemaMerging.schemaDifference(sinkT, curCols, merged)
      }
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
      case Some(rule) =>
        val t = EnvelopeTransform(env, rule, tableId)
        // `converter-after-transform` (the reference's
        // PostTransformOperator converter hook): SOFT_DELETE rewrites
        // DELETE events as before-image INSERTs so the sink retains the row
        rule.postTransformConverter.map(_.toUpperCase) match {
          case Some("SOFT_DELETE") => Envelope.softDelete(t)
          case Some(other) => throw new IllegalArgumentException(
            s"unknown converter-after-transform '$other' (supported: SOFT_DELETE)")
          case None => t
        }
      case None => env
    }
    router.route(tableId).foreach { sinkT =>
      val sinkSchema = sink
        .schemaOf(sinkT)
        .orElse(evolution.evolvedSchemas.latest(sinkT))
        .getOrElse(throw new IllegalStateException(s"sink table $sinkT not created"))
      val coerced = SchemaDerivator.coerceEnvelope(
        transformed, sinkSchema.struct, renameHistoryFor(tableId))
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

  /** Project a schema-change event through the table's TRANSFORM before it
    * reaches the sink (the reference PreTransformOperator's schema path):
    * with an explicit projection the sink schema is the projected shape, so
    * column events on projected-away columns must not reach the applier —
    * an AlterColumnType for an absent column would crash the sink DDL, and
    * an AddColumn would create a phantom column the data path (which always
    * projects) never populates. A wildcard (or absent) projection passes
    * events through; a mid-stream CreateTable re-derives the transformed
    * schema exactly like [[createTables]]. Column events narrow to the
    * projection's PASS-THROUGH columns (bare names in the output — computed
    * outputs have no 1:1 upstream column). */
  private def throughTransform(
      tableId: TableId, e: SchemaChangeEvent): Option[SchemaChangeEvent] =
    ruleFor(tableId) match {
      case None => Some(e)
      case Some(rule) =>
        e match {
          case ev: CreateTableEvent =>
            Some(ev.copy(schema = transformedSchema(tableId, ev.schema)))
          case _ if rule.projection.forall(
              p => TransformOp.splitProjection(p).contains("*")) => Some(e)
          case _: AddColumnEvent => None // a fixed projection cannot grow
          case ev: DropColumnEvent =>
            val keep = ev.droppedColumns.filter(passThrough(rule).contains)
            if (keep.isEmpty) None else Some(ev.copy(droppedColumns = keep))
          case ev: AlterColumnTypeEvent =>
            val keep = ev.typeMapping.view
              .filterKeys(passThrough(rule).contains).toMap
            if (keep.isEmpty) None else Some(ev.copy(typeMapping = keep))
          case ev: RenameColumnEvent =>
            // lenient evolution turns a rename into an add of the NEW name,
            // which a fixed projection never includes; a projected-away old
            // name affects the sink not at all — either way nothing reaches
            // the sink unless the OLD name passes through, and then the
            // projection itself still selects the old (now absent) column:
            // refuse loudly rather than ship a broken projection
            val hit = ev.nameMapping.keys.filter(passThrough(rule).contains)
            require(hit.isEmpty,
              s"rename of projected column(s) ${hit.mkString(", ")} on " +
                s"$tableId would break the transform's projection " +
                s"'${rule.projection.get}' — update the pipeline definition")
            None
          case other => Some(other) // table-level events pass
        }
    }

  /** The projection's pass-through outputs: bare column names (no alias,
    * no computation). */
  private def passThrough(rule: TransformRule): Set[String] =
    rule.projection.map(p => TransformOp.splitProjection(p)
      .map(_.trim).filter(_.matches("[A-Za-z_][A-Za-z0-9_]*")).toSet)
      .getOrElse(Set.empty)

  /** Handle a schema-change event on the control path (between batches):
    * transform-project it, track the upstream schema, then deduce per routed
    * sink table and run the deduced events through the evolution driver
    * (behavior normalization + sink filter + apply). A CREATE for an
    * already-known upstream table is skipped whole — the duplicate-CREATE
    * redundancy case of `SchemaUtils.isSchemaChangeEventRedundant`
    * (see [[SchemaDerivator.isRedundant]] for why only creates).
    */
  def processSchemaChange(event: SchemaChangeEvent): Seq[SchemaChangeEvent] = {
    throughTransform(event.tableId, event).toSeq.flatMap { projected =>
      if (projected.isInstanceOf[CreateTableEvent] &&
          SchemaDerivator.isRedundant(upstreamSchemas.latest(projected.tableId), projected))
        Seq.empty
      else {
        upstreamSchemas.applySchemaChange(projected)
        router.route(projected.tableId).flatMap { sinkT =>
          deduceForSink(sinkT, projected).flatMap(evolution.handle)
        }
      }
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
