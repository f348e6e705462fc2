package graft.sinks

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** One OceanBase column as the catalog renders it — the Scala shape of
  * `flink-cdc-pipeline-connector-oceanbase/.../OceanBaseColumn.java`. */
final case class OceanBaseColumn(
    name: String,
    dataType: String, // full spelled type, e.g. VARCHAR(10), DECIMAL(10, 2)
    nullable: Boolean = true,
    defaultValue: Option[String] = None,
    comment: Option[String] = None)

/** CDC type -> OceanBase type, with OceanBase's REAL limits — the
  * reference's `OceanBaseUtils.CdcDataTypeTransformer`:
  * CHAR caps at 256 (larger becomes VARCHAR), VARCHAR caps at 262144
  * (larger becomes TEXT, whose default value must drop), VARBINARY caps
  * at 1048576 (larger becomes LONGBLOB), timestamp precision caps at 6,
  * TIMESTAMP carries a zone (zoned/local-zoned) while DATETIME does not.
  */
object OceanBaseTypes {
  import CdcTypes._

  val MaxCharSize = 256
  val MaxVarcharSize = 262144
  val MaxVarbinarySize = 1048576

  def fromCdc(t: CdcType): (String, Boolean, Boolean) = t match {
    // (spelled type, nullable, defaultValueAllowed)
    case BooleanT(n) => ("BOOLEAN", n, true)
    case TinyIntT(n) => ("TINYINT", n, true)
    case SmallIntT(n) => ("SMALLINT", n, true)
    case IntT(n) => ("INT", n, true)
    case BigIntT(n) => ("BIGINT", n, true)
    case FloatT(n) => ("FLOAT", n, true)
    case DoubleT(n) => ("DOUBLE", n, true)
    case DecimalT(p, s, n) => (s"DECIMAL($p, $s)", n, true)
    case CharT(len, n) =>
      if (len <= MaxCharSize) (s"CHAR($len)", n, true)
      else (s"VARCHAR(${math.min(len, MaxVarcharSize)})", n, true)
    case VarCharT(len, n) =>
      if (len <= MaxVarcharSize) (s"VARCHAR($len)", n, true)
      else ("TEXT", n, false) // a TEXT column can't have a default in OB
    case BinaryT(_, n) => ("BINARY", n, true)
    case VarBinaryT(len, n) =>
      if (len <= MaxVarbinarySize) (s"VARBINARY($len)", n, true)
      else ("LONGBLOB", n, true)
    case DateT(n) => ("DATE", n, true)
    case TimeT(p, n) => (s"TIME(${math.min(p, 6)})", n, true)
    case TimestampT(p, n) => (s"DATETIME(${math.min(p, 6)})", n, true)
    case ZonedTimestampT(p, n) => (s"TIMESTAMP(${math.min(p, 6)})", n, true)
    case LocalZonedTimestampT(p, n) => (s"TIMESTAMP(${math.min(p, 6)})", n, true)
    case other => throw new IllegalArgumentException(
      s"Unsupported CDC data type $other for OceanBase")
  }

  /** Spark struct field -> OB type. Spark's StringType is unbounded, but
    * mapping it to TEXT (the reference's unbounded-STRING rule) would make
    * every string PRIMARY KEY un-indexable — OB refuses TEXT keys — so it
    * takes the largest indexable VARCHAR instead. */
  def fromSpark(dt: DataType, nullable: Boolean): (String, Boolean, Boolean) = dt match {
    case BooleanType => ("BOOLEAN", nullable, true)
    case ByteType => ("TINYINT", nullable, true)
    case ShortType => ("SMALLINT", nullable, true)
    case IntegerType => ("INT", nullable, true)
    case LongType => ("BIGINT", nullable, true)
    case FloatType => ("FLOAT", nullable, true)
    case DoubleType => ("DOUBLE", nullable, true)
    case d: DecimalType => (s"DECIMAL(${d.precision}, ${d.scale})", nullable, true)
    case StringType => (s"VARCHAR($MaxVarcharSize)", nullable, true)
    case BinaryType => (s"VARBINARY($MaxVarbinarySize)", nullable, true)
    case DateType => ("DATE", nullable, true)
    case TimestampType => ("TIMESTAMP(6)", nullable, true)
    case TimestampNTZType => ("DATETIME(6)", nullable, true)
    case other => throw new IllegalArgumentException(
      s"Unsupported Spark type $other for OceanBase")
  }
}

/** The OceanBase catalog SPI — the reference's abstract
  * `OceanBaseCatalog.java`: existence probes over INFORMATION_SCHEMA and
  * DDL execution, with a MySQL-tenant implementation and an Oracle-tenant
  * one that refuses every operation (the reference's current Oracle-mode
  * surface, `OceanBaseOracleCatalog.java`). */
sealed abstract class OceanBaseCatalog(client: () => OceanBaseWireClient) {
  def databaseExists(databaseName: String): Boolean
  def createDatabase(databaseName: String, ignoreIfExists: Boolean): Unit
  def tableExists(databaseName: String, tableName: String): Boolean
  def createTable(databaseName: String, tableName: String,
      columns: Seq[OceanBaseColumn], tableKeys: Seq[String],
      ignoreIfExists: Boolean): Unit
  def alterAddColumns(databaseName: String, tableName: String,
      addColumns: Seq[OceanBaseColumn]): Unit
  def alterDropColumns(databaseName: String, tableName: String,
      dropColumns: Seq[String]): Unit
  def alterColumnType(databaseName: String, tableName: String,
      columnName: String, spelledType: String): Unit
  def renameColumn(databaseName: String, tableName: String,
      oldColumnName: String, newColumnName: String): Unit
  def dropTable(databaseName: String, tableName: String): Unit
  def truncateTable(databaseName: String, tableName: String): Unit
  protected def execute(sql: String): Unit = {
    val c = client()
    try c.query(sql) finally c.close()
  }
  protected def querySingleColumn(sql: String): Seq[String] = {
    val c = client()
    try c.query(sql).rows.flatMap(_.headOption.flatten) finally c.close()
  }
}

/** MySQL-tenant catalog: DDL strings byte-for-byte in the reference's
  * shapes (`OceanBaseMySQLCatalog.java` — its own unit test pins
  * buildAlterAddColumnsSql exactly, matched by OceanBaseCatalogSpec). */
final class OceanBaseMySqlCatalog(client: () => OceanBaseWireClient)
    extends OceanBaseCatalog(client) {

  import OceanBaseMySqlCatalog._

  override def databaseExists(databaseName: String): Boolean = {
    require(databaseName.trim.nonEmpty, "database name cannot be null or empty.")
    querySingleColumn(
      "SELECT `SCHEMA_NAME` FROM `INFORMATION_SCHEMA`.`SCHEMATA` WHERE " +
        s"SCHEMA_NAME = '${escapeSingleQuote(databaseName)}';").nonEmpty
  }

  override def createDatabase(databaseName: String, ignoreIfExists: Boolean): Unit = {
    require(databaseName.trim.nonEmpty, "database name cannot be null or empty.")
    execute(buildCreateDatabaseSql(quote(databaseName), ignoreIfExists))
  }

  override def tableExists(databaseName: String, tableName: String): Boolean = {
    require(databaseName.trim.nonEmpty, "database name cannot be null or empty.")
    require(tableName.trim.nonEmpty, "table name cannot be null or empty.")
    querySingleColumn(
      "SELECT `TABLE_NAME` FROM `INFORMATION_SCHEMA`.`TABLES` WHERE " +
        s"TABLE_SCHEMA = '${escapeSingleQuote(databaseName)}' AND " +
        s"TABLE_NAME = '${escapeSingleQuote(tableName)}';").nonEmpty
  }

  override def createTable(databaseName: String, tableName: String,
      columns: Seq[OceanBaseColumn], tableKeys: Seq[String],
      ignoreIfExists: Boolean): Unit =
    execute(buildCreateTableSql(databaseName, tableName, columns, tableKeys,
      ignoreIfExists))

  override def alterAddColumns(databaseName: String, tableName: String,
      addColumns: Seq[OceanBaseColumn]): Unit = {
    require(databaseName.trim.nonEmpty, "database name cannot be null or empty.")
    require(tableName.trim.nonEmpty, "table name cannot be null or empty.")
    require(addColumns.nonEmpty, "Added columns should not be empty.")
    execute(buildAlterAddColumnsSql(databaseName, tableName, addColumns))
  }

  override def alterDropColumns(databaseName: String, tableName: String,
      dropColumns: Seq[String]): Unit = {
    require(dropColumns.nonEmpty, "Drop columns should not be empty.")
    execute(buildAlterDropColumnsSql(databaseName, tableName, dropColumns))
  }

  override def alterColumnType(databaseName: String, tableName: String,
      columnName: String, spelledType: String): Unit =
    execute(String.format(AlterColumnTypeDdl, quote(databaseName),
      quote(tableName), quote(columnName), spelledType))

  override def renameColumn(databaseName: String, tableName: String,
      oldColumnName: String, newColumnName: String): Unit =
    execute(String.format(RenameDdl, quote(databaseName), quote(tableName),
      quote(oldColumnName), quote(newColumnName)))

  override def dropTable(databaseName: String, tableName: String): Unit =
    execute(s"DROP TABLE ${quote(databaseName)}.${quote(tableName)}")

  override def truncateTable(databaseName: String, tableName: String): Unit =
    execute(s"TRUNCATE TABLE ${quote(databaseName)}.${quote(tableName)}")
}

object OceanBaseMySqlCatalog {
  // reference OceanBaseMySQLCatalog.java DDL templates
  private[sinks] val RenameDdl = "ALTER TABLE %s.%s RENAME COLUMN %s TO %s"
  private[sinks] val AlterColumnTypeDdl = "ALTER TABLE %s.%s MODIFY COLUMN %s %s;"

  def escapeSingleQuote(dbOrTableName: String): String =
    dbOrTableName.replace("'", "\\'")
  def quote(dbOrTableName: String): String =
    "`" + dbOrTableName.replace("`", "``") + "`"

  private[sinks] def buildCreateDatabaseSql(databaseName: String,
      ignoreIfExists: Boolean): String =
    s"CREATE DATABASE ${if (ignoreIfExists) "IF NOT EXISTS " else ""}$databaseName;"

  private[sinks] def buildColumnStmt(c: OceanBaseColumn): String = {
    val b = new StringBuilder
    b ++= "`"; b ++= c.name; b ++= "` "
    b ++= c.dataType.toUpperCase
    b ++= " "
    b ++= (if (c.nullable) "NULL" else "NOT NULL")
    c.defaultValue.foreach(d => b ++= s""" DEFAULT "$d"""")
    c.comment.foreach(cm => b ++= s""" COMMENT "$cm"""")
    b.toString
  }

  private[sinks] def buildCreateTableSql(databaseName: String, tableName: String,
      columns: Seq[OceanBaseColumn], tableKeys: Seq[String],
      ignoreIfExists: Boolean): String = {
    val b = new StringBuilder
    b ++= s"CREATE TABLE ${if (ignoreIfExists) "IF NOT EXISTS " else ""}"
    b ++= s"${quote(databaseName)}.${quote(tableName)}"
    b ++= " (\n"
    b ++= columns.map(buildColumnStmt).mkString(",\n")
    // the reference always renders the key clause from tableKeys; a key-less
    // DUPLICATE_KEY table (pk-less, no partition keys) renders none
    if (tableKeys.nonEmpty) {
      b ++= ",\n"
      b ++= s"PRIMARY KEY (${tableKeys.map(k => s"`$k`").mkString(", ")})"
    }
    b ++= "\n) "
    b ++= ";"
    b.toString
  }

  private[sinks] def buildAlterAddColumnsSql(databaseName: String,
      tableName: String, addColumns: Seq[OceanBaseColumn]): String = {
    val b = new StringBuilder
    b ++= s"ALTER TABLE ${quote(databaseName)}.${quote(tableName)} "
    b ++= addColumns.map(c => "ADD COLUMN " + buildColumnStmt(c)).mkString(", ")
    b ++= ";"
    b.toString
  }

  private[sinks] def buildAlterDropColumnsSql(databaseName: String,
      tableName: String, dropColumns: Seq[String]): String = {
    val b = new StringBuilder
    b ++= s"ALTER TABLE ${quote(databaseName)}.${quote(tableName)} "
    b ++= dropColumns.map(c => s"DROP COLUMN `$c`").mkString(", ")
    b ++= ";"
    b.toString
  }
}

/** Oracle-tenant catalog: every operation refuses — the reference's
  * complete current Oracle-mode surface (`OceanBaseOracleCatalog.java`),
  * message included, so a pipeline targeting an Oracle tenant fails the
  * same way it would there instead of silently running MySQL DDL. */
final class OceanBaseOracleCatalog(client: () => OceanBaseWireClient)
    extends OceanBaseCatalog(client) {
  private def refuse(): Nothing = throw new UnsupportedOperationException(
    "This operation under oracle tenant is not supported currently.")
  override def databaseExists(databaseName: String): Boolean = refuse()
  override def createDatabase(databaseName: String, ignoreIfExists: Boolean): Unit = refuse()
  override def tableExists(databaseName: String, tableName: String): Boolean = refuse()
  override def createTable(databaseName: String, tableName: String,
      columns: Seq[OceanBaseColumn], tableKeys: Seq[String],
      ignoreIfExists: Boolean): Unit = refuse()
  override def alterAddColumns(databaseName: String, tableName: String,
      addColumns: Seq[OceanBaseColumn]): Unit = refuse()
  override def alterDropColumns(databaseName: String, tableName: String,
      dropColumns: Seq[String]): Unit = refuse()
  override def alterColumnType(databaseName: String, tableName: String,
      columnName: String, spelledType: String): Unit = refuse()
  override def renameColumn(databaseName: String, tableName: String,
      oldColumnName: String, newColumnName: String): Unit = refuse()
  override def dropTable(databaseName: String, tableName: String): Unit = refuse()
  override def truncateTable(databaseName: String, tableName: String): Unit = refuse()
}

/** Tenant-dialect discovery — the reference's
  * `OceanBaseCatalogFactory.createOceanBaseCatalog`: probe the connection
  * for the compatibility mode and pick the catalog. A real OB server (and
  * the double) answers `SELECT @@ob_compatibility_mode`. */
object OceanBaseCatalogFactory {
  def create(host: String, port: Int, user: String): OceanBaseCatalog = {
    val factory = () => new OceanBaseWireClient(host, port, user)
    val probe = factory()
    val mode =
      try probe.query("SELECT @@ob_compatibility_mode")
        .rows.headOption.flatMap(_.headOption.flatten).getOrElse("")
      finally probe.close()
    mode.toUpperCase match {
      case "MYSQL" => new OceanBaseMySqlCatalog(factory)
      case "ORACLE" => new OceanBaseOracleCatalog(factory)
      case other => throw new IllegalStateException(
        s"Fail to create OceanBaseCatalog: unknown tenant '$other'.")
    }
  }
}

/** OceanBase pipeline sink — the reference's dedicated
  * `flink-cdc-pipeline-connector-oceanbase` (`sink.type: oceanbase`, NOT
  * the mysql-wire JDBC alias): a catalog-backed MetadataApplier plus a
  * buffered upsert/delete writer over the MySQL text wire, with the OB
  * connector's memstore back-pressure check.
  *
  * Reference semantics carried over:
  *  - partition keys fold into the table keys (OB partition tables are
  *    not supported by the connector; `OceanBaseUtils.toOceanBaseTable`)
  *    and a pk-less table becomes DUPLICATE_KEY (no key clause here);
  *  - every key part must be NOT NULL (the reference's
  *    checkPrimaryKeyNotNull message);
  *  - ADD COLUMN supports LAST position only (online DDL; the reference's
  *    applyAddColumnEvent precondition);
  *  - TRUNCATE of a missing table fails (the reference checks exists);
  *  - upserts are `INSERT .. ON DUPLICATE KEY UPDATE c=VALUES(c)` and
  *    deletes address the full key, both batched `bufferSize` rows per
  *    statement from executor partitions;
  *  - `memstore-check.enabled`: before each flush the writer probes
  *    GV$OB_MEMSTORE and waits while active/limit exceeds the threshold
  *    (the OB connector's OceanBaseWriterEvent memstore check).
  */
final class OceanBaseDataSink(
    host: String,
    port: Int,
    username: String,
    memstoreCheckEnabled: Boolean = true,
    memstoreThreshold: Double = 0.9,
    memstoreCheckIntervalMs: Long = 100L,
    memstoreMaxChecks: Int = 50,
    bufferSize: Int = 1024)
    extends DataSink {

  private val schemas = new SchemaManager
  @transient private lazy val catalog: OceanBaseCatalog =
    OceanBaseCatalogFactory.create(host, port, username)

  private def toColumns(struct: StructType,
      keys: Set[String]): Seq[OceanBaseColumn] =
    struct.fields.toSeq.map { f =>
      if (keys.contains(f.name) && f.nullable)
        throw new IllegalArgumentException(
          "All parts of a PRIMARY KEY must be NOT NULL in OceanBase. " +
            "if you need NULL in a key, use UNIQUE instead.")
      val (tpe, nullable, _) = OceanBaseTypes.fromSpark(f.dataType, f.nullable)
      OceanBaseColumn(f.name, tpe, nullable)
    }

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    schemas.applySchemaChange(event)
    event match {
      case CreateTableEvent(t, schema) =>
        // partition keys fold into the table keys (reference
        // toOceanBaseTable: "use partitionKeys as part of primaryKeys")
        val keys = (schema.primaryKeys ++
          schema.partitionKeys.filterNot(schema.primaryKeys.contains)).toList
        val cols = toColumns(schema.struct, keys.toSet)
        if (!catalog.databaseExists(t.schemaName))
          catalog.createDatabase(t.schemaName, ignoreIfExists = true)
        catalog.createTable(t.schemaName, t.tableName, cols, keys,
          ignoreIfExists = true)
      case AddColumnEvent(t, cols) =>
        cols.foreach { c =>
          require(c.position == AddColumnEvent.Last,
            "The oceanbase pipeline connector currently only supports add " +
              "the column to the last.")
        }
        val obCols = cols.map { c =>
          val (tpe, nullable, _) = OceanBaseTypes.fromCdc(c.cdcType)
          OceanBaseColumn(c.name, tpe, nullable)
        }
        catalog.alterAddColumns(t.schemaName, t.tableName, obCols)
      case DropColumnEvent(t, dropped) =>
        catalog.alterDropColumns(t.schemaName, t.tableName, dropped)
      case RenameColumnEvent(t, mapping) =>
        mapping.foreach { case (o, n) =>
          catalog.renameColumn(t.schemaName, t.tableName, o, n) }
      case AlterColumnTypeEvent(t, mapping) =>
        mapping.foreach { case (c, ct) =>
          val (tpe, _, _) = OceanBaseTypes.fromCdc(ct)
          catalog.alterColumnType(t.schemaName, t.tableName, c, tpe)
        }
      case DropTableEvent(t) => catalog.dropTable(t.schemaName, t.tableName)
      case TruncateTableEvent(t) =>
        // the reference checks existence first and fails on a missing table
        if (catalog.tableExists(t.schemaName, t.tableName))
          catalog.truncateTable(t.schemaName, t.tableName)
        else throw new IllegalStateException(
          s"Failed to truncate table ${t.schemaName}.${t.tableName}, " +
            "because the table not exist")
    }
  }

  override def schemaOf(t: TableId): Option[TableSchema] = schemas.latest(t)

  override def writeBatch(t: TableId, upserts: DataFrame,
      deletedKeys: DataFrame): Unit = {
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val keys = (schema.primaryKeys ++
      schema.partitionKeys.filterNot(schema.primaryKeys.contains)).toList
    val (h, p, u) = (host, port, username)
    val (msEnabled, msThreshold, msInterval, msMax) =
      (memstoreCheckEnabled, memstoreThreshold, memstoreCheckIntervalMs,
        memstoreMaxChecks)
    val bs = bufferSize
    val cols = upserts.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val db = t.schemaName; val tbl = t.tableName
    upserts.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val c = new OceanBaseWireClient(h, p, u)
      try {
        rows.grouped(bs).foreach { group =>
          OceanBaseDataSink.awaitMemstore(c, msEnabled, msThreshold,
            msInterval, msMax)
          val tuples = group.map(r => cols.indices.map(i =>
            OceanBaseDataSink.literal(r.get(i))).mkString("(", ", ", ")"))
            .mkString(", ")
          val updateClause =
            if (keys.isEmpty) "" // DUPLICATE_KEY table: plain append
            else if (nonKeys.isEmpty)
              // all-columns-key table: a redelivered key must still be an
              // upsert no-op, not a duplicate-key error — MySQL's idiom
              s" ON DUPLICATE KEY UPDATE `${keys.head}`=VALUES(`${keys.head}`)"
            else " ON DUPLICATE KEY UPDATE " + nonKeys.map(cn =>
              s"`$cn`=VALUES(`$cn`)").mkString(", ")
          c.query(s"INSERT INTO `$db`.`$tbl` " +
            s"(${cols.map(cn => s"`$cn`").mkString(", ")}) VALUES $tuples" +
            updateClause)
        }
      } finally c.close()
    }
    if (keys.nonEmpty) {
      val delCols = deletedKeys.columns.toSeq
      deletedKeys.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val c = new OceanBaseWireClient(h, p, u)
        // deletes batch like the upserts (one statement per bufferSize
        // keys, the OB record flusher's shape): a round trip per key
        // would dominate a large retraction at deployment scale
        try rows.grouped(bs).foreach { group =>
          OceanBaseDataSink.awaitMemstore(c, msEnabled, msThreshold,
            msInterval, msMax)
          val where =
            if (delCols.size == 1)
              s"`${delCols.head}` IN (" + group.map(r =>
                OceanBaseDataSink.literal(r.get(0))).mkString(", ") + ")"
            else group.map(r => "(" + delCols.indices.map(i =>
              s"`${delCols(i)}`=${OceanBaseDataSink.literal(r.get(i))}")
              .mkString(" AND ") + ")").mkString(" OR ")
          c.query(s"DELETE FROM `$db`.`$tbl` WHERE $where")
        } finally c.close()
      }
    }
  }
}

object OceanBaseDataSink {
  private val TsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Render one value as a MySQL text-protocol literal. */
  private[sinks] def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case b: Boolean => if (b) "1" else "0"
    case b: Array[Byte] => "x'" + b.map(x => f"$x%02x").mkString + "'"
    case t: java.sql.Timestamp => "'" + t.toLocalDateTime.format(TsFormat) + "'"
    case t: java.time.LocalDateTime => "'" + t.format(TsFormat) + "'"
    case d: java.sql.Date => s"'$d'"
    case d: java.time.LocalDate => s"'$d'"
    case n => n.toString
  }

  /** The memstore back-pressure gate: probe active/limit and wait while
    * over threshold — bounded, then fail loudly (a writer blocked forever
    * on a full memstore must surface, not hang the stream silently). */
  private[sinks] def awaitMemstore(c: OceanBaseWireClient, enabled: Boolean,
      threshold: Double, intervalMs: Long, maxChecks: Int): Unit = {
    if (!enabled) return
    var checks = 0
    while ({
      val r = c.query(
        "SELECT ACTIVE_SPAN, MEMSTORE_LIMIT FROM oceanbase.GV$OB_MEMSTORE")
      val row = r.rows.headOption.getOrElse(Seq(Some("0"), Some("1")))
      val active = row.head.map(_.toDouble).getOrElse(0.0)
      val limit = row(1).map(_.toDouble).getOrElse(1.0)
      limit > 0 && active / limit > threshold
    }) {
      checks += 1
      if (checks > maxChecks) throw new IllegalStateException(
        s"OceanBase memstore stayed above $threshold for $checks checks — " +
          "refusing to write into a full memstore")
      Thread.sleep(intervalMs)
    }
  }
}
