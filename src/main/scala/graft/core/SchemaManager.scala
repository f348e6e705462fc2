package graft.core

import scala.collection.concurrent.TrieMap

/** Driver-side versioned per-table schema registry, mirroring
  * `flink-cdc-runtime/.../schema/common/SchemaManager.java`. Thread-safe because
  * streaming `foreachBatch` callbacks may interleave with listener threads.
  */
final class SchemaManager {
  private val versions = TrieMap.empty[TableId, Vector[(Int, TableSchema)]]

  def latest(tableId: TableId): Option[TableSchema] =
    versions.get(tableId).flatMap(_.lastOption).map(_._2)

  def versionOf(tableId: TableId, version: Int): Option[TableSchema] =
    versions.get(tableId).flatMap(_.find(_._1 == version)).map(_._2)

  def register(tableId: TableId, schema: TableSchema): Int = synchronized {
    val cur = versions.getOrElse(tableId, Vector.empty)
    val next = cur.lastOption.map(_._1 + 1).getOrElse(0)
    // bounded history (`SchemaManager.java:58` VERSIONS_TO_KEEP = 3): old
    // versions exist only to coerce in-flight rows of recent epochs; an
    // unbounded map would grow with every DDL for the job's lifetime
    val kept = (cur :+ (next -> schema)).takeRight(SchemaManager.VersionsToKeep)
    versions.update(tableId, kept)
    next
  }

  def knownTables: Set[TableId] = versions.keySet.toSet

  /** Apply a schema-change event to the latest version, registering the result.
    * Mirrors `SchemaUtils.applySchemaChangeEvent` (`common/utils/SchemaUtils.java:109`).
    */
  def applySchemaChange(event: SchemaChangeEvent): TableSchema = synchronized {
    import org.apache.spark.sql.types.{StructField, StructType}
    event match {
      case CreateTableEvent(t, schema) =>
        register(t, schema); schema
      case AddColumnEvent(t, cols) =>
        val cur = latest(t).getOrElse(sys.error(s"unknown table $t"))
        var fields = cur.struct.fields.toVector
        cols.foreach { c =>
          val md = c.defaultExpr match {
            case Some(d) => new org.apache.spark.sql.types.MetadataBuilder()
              .putString(AddColumnEvent.DefaultKey, d).build()
            case None => org.apache.spark.sql.types.Metadata.empty
          }
          val f = CdcTypes.toSparkField(c.name, c.cdcType, md)
          fields = c.position match {
            case AddColumnEvent.Last  => fields :+ f
            case AddColumnEvent.First => f +: fields
            case AddColumnEvent.After(ex) =>
              val i = fields.indexWhere(_.name == ex)
              require(i >= 0, s"no column $ex in $t")
              (fields.take(i + 1) :+ f) ++ fields.drop(i + 1)
            case AddColumnEvent.Before(ex) =>
              val i = fields.indexWhere(_.name == ex)
              require(i >= 0, s"no column $ex in $t")
              (fields.take(i) :+ f) ++ fields.drop(i)
          }
        }
        val evolved = cur.copy(struct = StructType(fields))
        register(t, evolved); evolved
      case DropColumnEvent(t, dropped) =>
        val cur = latest(t).getOrElse(sys.error(s"unknown table $t"))
        val evolved =
          cur.copy(struct = StructType(cur.struct.fields.filterNot(f => dropped.contains(f.name))))
        register(t, evolved); evolved
      case RenameColumnEvent(t, mapping) =>
        val cur = latest(t).getOrElse(sys.error(s"unknown table $t"))
        val evolved = cur.copy(
          struct = StructType(
            cur.struct.fields.map(f => f.copy(name = mapping.getOrElse(f.name, f.name)))),
          primaryKeys = cur.primaryKeys.map(k => mapping.getOrElse(k, k)),
          partitionKeys = cur.partitionKeys.map(k => mapping.getOrElse(k, k)))
        register(t, evolved); evolved
      case AlterColumnTypeEvent(t, mapping) =>
        val cur = latest(t).getOrElse(sys.error(s"unknown table $t"))
        val evolved = cur.copy(struct = StructType(cur.struct.fields.map { f =>
          mapping.get(f.name) match {
            // rebuild through toSparkField: the new type's width replaces (or
            // clears) the erased-width tag — an alter VARCHAR(17)→STRING must
            // not leave the stale width behind
            case Some(ct) => CdcTypes.toSparkField(f.name, ct, f.metadata)
            case None     => f
          }
        }))
        register(t, evolved); evolved
      // DROP TABLE and TRUNCATE leave the registered schema UNCHANGED
      // (`SchemaUtils.applySchemaChangeEvent:116-118` — dropTableEvent ->
      // schema): the table's shape is still needed to route/diff later
      // events of the OTHER upstreams of a merged sink — removing it would
      // collapse a merged sink to one dependency and forward raw events the
      // reference derives through the diff (i.e. swallows).
      case DropTableEvent(t) =>
        latest(t).getOrElse(sys.error(s"unknown table $t"))
      case TruncateTableEvent(t) =>
        latest(t).getOrElse(sys.error(s"unknown table $t"))
    }
  }
}

object SchemaManager {
  /** `SchemaManager.java:58` — recent versions kept per table. */
  val VersionsToKeep = 3
}
