package graft.pipeline

import graft.core._

/** Distributed-topology schema handling — the micro-batch form of
  * `runtime/.../schema/distributed/SchemaOperator.java` +
  * `SchemaCoordinator.java` (wired for sources whose metadata differs per
  * partition: `DataSource.isParallelMetadataSource`,
  * topology `FlinkPipelineComposer.java:203-224`).
  *
  * In the reference each subtask may observe a different shape of the same
  * table (e.g. a sharded MongoDB collection) and the coordinator reduces the
  * per-subtask schemas before deriving sink DDL. In the micro-batch model the
  * driver sees every partition's observation each batch, so the reduce is a
  * pure fold over the widening lattice ([[SchemaMerging.leastCommonSchema]])
  * followed by a diff against the evolved schema — no RPC, no operator state.
  */
object DistributedSchemaReducer {

  /** One partition's view of one table in this batch. */
  final case class PartitionSchemaReport(
      partitionId: Int,
      tableId: TableId,
      schema: TableSchema)

  /** Reduce per-partition observations of the same table to the least common
    * schema. Primary keys must agree (the reference rejects divergent keys);
    * partition keys and options are unioned first-wins.
    */
  def reduce(reports: Seq[TableSchema]): TableSchema = {
    require(reports.nonEmpty, "no schema reports to reduce")
    val pks = reports.map(_.primaryKeys).distinct
    require(pks.size == 1,
      s"primary keys diverge across partitions: ${pks.mkString(" vs ")}")
    val merged = SchemaMerging.mergeAll(reports.map(r => SchemaMerging.fromStruct(r.struct)))
    TableSchema(
      SchemaMerging.toStruct(merged),
      primaryKeys = pks.head,
      partitionKeys = reports.head.partitionKeys,
      options = reports.foldLeft(Map.empty[String, String])((acc, r) => r.options ++ acc))
  }

  /** Full batch step: group this batch's reports by table, reduce each, and
    * emit the schema-change events that evolve the driver's known schema into
    * the reduced one (CreateTable the first time, AlterColumnType/AddColumn
    * diffs afterwards) — `SchemaCoordinator#handleReduceSchemaRequest`'s
    * derive-then-apply, collapsed to a pure function.
    *
    * Feed the returned events to a [[SchemaEvolutionDriver]] to apply behavior
    * filtering and sink DDL exactly like the regular topology.
    */
  def deriveEvents(
      known: SchemaManager,
      reports: Seq[PartitionSchemaReport]): Seq[SchemaChangeEvent] =
    reports.groupBy(_.tableId).toSeq.sortBy(_._1.identifier).flatMap {
      case (tid, perTable) =>
        val reduced = reduce(perTable.map(_.schema))
        known.latest(tid) match {
          case None => Seq(CreateTableEvent(tid, reduced))
          case Some(cur) =>
            SchemaMerging.schemaDifference(
              tid,
              SchemaMerging.fromStruct(cur.struct),
              SchemaMerging.leastCommonSchema(
                SchemaMerging.fromStruct(cur.struct),
                SchemaMerging.fromStruct(reduced.struct)))
        }
    }
}
