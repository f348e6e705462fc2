package graft.core

/** Change-event ADT, mirroring the classes under `flink-cdc-common/.../event/`.
  *
  * Data rows travel the Spark data plane as envelope DataFrame columns
  * (see `graft.operators.Envelope`); these case classes model the control path
  * (schema changes) and test fixtures, exactly as SURVEY.md §1.1 prescribes:
  * schema events never enter the hot DataFrame.
  */
sealed trait Event { def tableId: TableId }

/** `common/event/OperationType.java:26-30`. */
object OperationType extends Enumeration {
  val INSERT, UPDATE, REPLACE, DELETE = Value
}

/** `common/event/DataChangeEvent.java:34-143`. `before`/`after` are field maps
  * (column name → value) because fixture rows are dynamic; the data plane never
  * materializes these objects per-row.
  */
final case class DataChangeEvent(
    tableId: TableId,
    op: OperationType.Value,
    before: Map[String, Any] = Map.empty,
    after: Map[String, Any] = Map.empty,
    meta: Map[String, String] = Map.empty)
    extends Event

object DataChangeEvent {
  def insert(t: TableId, after: Map[String, Any]): DataChangeEvent =
    DataChangeEvent(t, OperationType.INSERT, after = after)
  def update(t: TableId, before: Map[String, Any], after: Map[String, Any]): DataChangeEvent =
    DataChangeEvent(t, OperationType.UPDATE, before = before, after = after)
  def replace(t: TableId, after: Map[String, Any]): DataChangeEvent =
    DataChangeEvent(t, OperationType.REPLACE, after = after)
  def delete(t: TableId, before: Map[String, Any]): DataChangeEvent =
    DataChangeEvent(t, OperationType.DELETE, before = before)
}

/** The seven concrete schema-change kinds (`common/event/SchemaChangeEventType.java`). */
sealed trait SchemaChangeEvent extends Event

final case class CreateTableEvent(tableId: TableId, schema: TableSchema) extends SchemaChangeEvent

/** `AddColumnEvent.java` — columns carry an optional position (AFTER/FIRST/LAST/BEFORE). */
final case class AddColumnEvent(
    tableId: TableId,
    columns: Seq[AddColumnEvent.ColumnWithPosition])
    extends SchemaChangeEvent
object AddColumnEvent {
  sealed trait Position
  case object First extends Position
  case object Last extends Position
  final case class After(existing: String) extends Position
  final case class Before(existing: String) extends Position
  final case class ColumnWithPosition(
      name: String,
      cdcType: CdcType,
      position: Position = Last,
      comment: Option[String] = None,
      /** `Column.defaultValueExpression` — the reference's column DEFAULT
        * (`Column.physicalColumn(name, type, comment, defaultExpr)`); rides
        * into the StructField metadata under [[AddColumnEvent.DefaultKey]]
        * and survives LENIENT rename-to-add derivation. */
      defaultExpr: Option[String] = None)

  /** StructField metadata key carrying a column's DEFAULT expression. */
  val DefaultKey = "graft.default"
}

final case class DropColumnEvent(tableId: TableId, droppedColumns: Seq[String])
    extends SchemaChangeEvent

/** old name → new name. */
final case class RenameColumnEvent(tableId: TableId, nameMapping: Map[String, String])
    extends SchemaChangeEvent

/** column name → new type. */
final case class AlterColumnTypeEvent(tableId: TableId, typeMapping: Map[String, CdcType])
    extends SchemaChangeEvent

final case class DropTableEvent(tableId: TableId) extends SchemaChangeEvent
final case class TruncateTableEvent(tableId: TableId) extends SchemaChangeEvent

object SchemaChangeEventType extends Enumeration {
  val CREATE_TABLE, ADD_COLUMN, DROP_COLUMN, RENAME_COLUMN, ALTER_COLUMN_TYPE, DROP_TABLE,
  TRUNCATE_TABLE = Value

  /** The reference's include/exclude tag grammar
    * (`ChangeEventUtils.resolveSchemaEvolutionTag`,
    * `SchemaChangeEventTypeFamily.ofTag`, `SchemaChangeEventType.ofTag`):
    * FAMILY tags (all / none / column / table / add / alter / create /
    * drop / rename) and the dotted specific tags ("add.column", ...).
    * Unknown tags refuse loudly — the reference silently resolves them to
    * nothing, which reads back as "schema evolution mysteriously off". */
  def ofTag(tag: String): Seq[Value] = tag.trim.toLowerCase match {
    case "all" => values.toSeq
    case "none" => Seq.empty
    case "column" => Seq(ADD_COLUMN, ALTER_COLUMN_TYPE, DROP_COLUMN, RENAME_COLUMN)
    case "table" => Seq(CREATE_TABLE, DROP_TABLE, TRUNCATE_TABLE)
    case "add" => Seq(ADD_COLUMN)
    case "alter" => Seq(ALTER_COLUMN_TYPE)
    case "create" => Seq(CREATE_TABLE)
    case "drop" => Seq(DROP_COLUMN, DROP_TABLE)
    case "rename" => Seq(RENAME_COLUMN)
    case dotted =>
      val norm = dotted.replace('.', '_').toUpperCase
      values.find(_.toString == norm).map(Seq(_)).getOrElse(
        throw new IllegalArgumentException(
          s"unknown schema-change tag '$tag' (family tags all/none/column/" +
            "table/add/alter/create/drop/rename, or specific tags like " +
            "add.column, alter.column.type)"))
  }

  def of(e: SchemaChangeEvent): Value = e match {
    case _: CreateTableEvent     => CREATE_TABLE
    case _: AddColumnEvent       => ADD_COLUMN
    case _: DropColumnEvent      => DROP_COLUMN
    case _: RenameColumnEvent    => RENAME_COLUMN
    case _: AlterColumnTypeEvent => ALTER_COLUMN_TYPE
    case _: DropTableEvent       => DROP_TABLE
    case _: TruncateTableEvent   => TRUNCATE_TABLE
  }
}
