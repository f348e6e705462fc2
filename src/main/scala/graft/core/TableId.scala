package graft.core

/** Three-part table identifier: `namespace.schemaName.tableName`.
  *
  * Mirrors the semantics of the reference's
  * `flink-cdc-common/src/main/java/org/apache/flink/cdc/common/event/TableId.java`:
  * a 1-part id is just a table name, 2-part is `schemaName.tableName`,
  * 3-part is `namespace.schemaName.tableName`.
  */
final case class TableId(namespace: String, schemaName: String, tableName: String) {
  def identifier: String =
    Seq(namespace, schemaName, tableName).filter(_ != null).filter(_.nonEmpty).mkString(".")
  override def toString: String = identifier
}

object TableId {
  def apply(tableName: String): TableId = TableId("", "", tableName)
  def of(schemaName: String, tableName: String): TableId = TableId("", schemaName, tableName)

  /** Parse a dotted identifier into up to three parts (last two win, like the reference). */
  def parse(s: String): TableId = {
    val parts = s.split("\\.", -1)
    parts.length match {
      case 1 => TableId("", "", parts(0))
      case 2 => TableId("", parts(0), parts(1))
      case 3 => TableId(parts(0), parts(1), parts(2))
      case n => TableId(parts.slice(0, n - 2).mkString("."), parts(n - 2), parts(n - 1))
    }
  }
}
