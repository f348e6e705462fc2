package graft.sources.mysql

import graft.core._
import org.apache.spark.sql.types.{StructField, StructType}

/** MySQL DDL statement → [[SchemaChangeEvent]]s.
  *
  * Re-expresses the reference's Antlr-based DDL listener
  * (`flink-cdc-pipeline-connector-mysql/.../source/parser/CustomMySqlAntlrDdlParser.java`
  * and `CustomAlterTableParserListener.java`) as a hand-rolled recursive split
  * parser: the CDC engine only needs the seven schema-change event kinds, not a
  * full SQL grammar, so the parser recognizes exactly the productions the
  * listener reacts to and ignores everything else (indexes, engine options,
  * charset clauses, ...).
  *
  * Type strings are mapped through [[CdcType.fromMySql]]
  * (`MySqlTypeUtils.java:116-260` semantics: unsigned widening, TINYINT(1),
  * JSON→STRING).
  */
object MySqlDdlParser {

  /** Parse one DDL statement. `currentSchema` (when known) lets
    * `ALTER ... CHANGE` suppress the AlterColumnTypeEvent if the declared type
    * is unchanged, matching the listener's behavior of only emitting events for
    * actual differences.
    */
  def parse(
      ddl: String,
      database: String = "",
      tinyInt1AsBoolean: Boolean = true,
      currentSchema: Option[TableSchema] = None): Seq[SchemaChangeEvent] = {
    val sql = ddl.trim.stripSuffix(";").trim
    val upper = sql.toUpperCase

    def tableId(raw: String): TableId = {
      val clean = raw.split("\\.").map(unquote).mkString(".")
      val tid = TableId.parse(clean)
      if (tid.schemaName.isEmpty && database.nonEmpty) TableId.of(database, tid.tableName) else tid
    }

    if (upper.startsWith("CREATE TABLE")) {
      val m = "(?is)CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([^\\s(]+)\\s*\\(".r
        .findFirstMatchIn(sql)
        .getOrElse(throw new IllegalArgumentException(s"Unparseable CREATE TABLE: $ddl"))
      // balanced-paren scan for the column body: table options / partition
      // clauses after the closing ')' may themselves contain parentheses
      val body = balancedBody(sql, m.end - 1)
      Seq(CreateTableEvent(tableId(m.group(1)), parseCreateBody(body, tinyInt1AsBoolean)))
    } else if (upper.startsWith("DROP TABLE")) {
      val m = "(?is)DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?([^\\s,;]+)".r
        .findFirstMatchIn(sql).get
      Seq(DropTableEvent(tableId(m.group(1))))
    } else if (upper.startsWith("TRUNCATE")) {
      val m = "(?is)TRUNCATE\\s+(?:TABLE\\s+)?([^\\s;]+)".r.findFirstMatchIn(sql).get
      Seq(TruncateTableEvent(tableId(m.group(1))))
    } else if (upper.startsWith("ALTER TABLE")) {
      val m = "(?is)ALTER\\s+TABLE\\s+([^\\s]+)\\s+(.*)".r.findFirstMatchIn(sql)
        .getOrElse(throw new IllegalArgumentException(s"Unparseable ALTER TABLE: $ddl"))
      parseAlterClauses(tableId(m.group(1)), m.group(2), tinyInt1AsBoolean, currentSchema)
    } else Seq.empty // USE, SET, CREATE INDEX, ... — not schema changes we track
  }

  /** Content between the '(' at `openIdx` and its matching ')' (quote-aware). */
  private def balancedBody(sql: String, openIdx: Int): String = {
    var depth = 0; var quote: Char = 0; var i = openIdx
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(openIdx + 1, i)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"Unbalanced parentheses in DDL: $sql")
  }

  // ---------------------------------------------------------------- CREATE

  private def parseCreateBody(body: String, tinyInt1AsBoolean: Boolean): TableSchema = {
    val defs = splitTopLevel(body, ',')
    var pks = Seq.empty[String]
    val fields = defs.flatMap { d0 =>
      val d = d0.trim
      val u = d.toUpperCase
      if (u.startsWith("PRIMARY KEY")) {
        pks = "\\(([^)]*)\\)".r.findFirstMatchIn(d)
          .map(_.group(1).split(',').map(s => unquote(s.trim)).toSeq).getOrElse(Seq.empty)
        None
      } else if (u.startsWith("KEY") || u.startsWith("INDEX") || u.startsWith("UNIQUE") ||
        u.startsWith("CONSTRAINT") || u.startsWith("FULLTEXT") || u.startsWith("SPATIAL") ||
        u.startsWith("FOREIGN") || u.startsWith("CHECK")) {
        None
      } else {
        val col = parseColumnDef(d, tinyInt1AsBoolean)
        if (col.inlinePrimaryKey) pks = pks :+ col.name
        Some(col)
      }
    }
    val struct = StructType(fields.map(c =>
      StructField(c.name, c.cdcType.toSpark, c.cdcType.nullable)))
    // PK columns are implicitly NOT NULL in MySQL
    val withPkNullability = StructType(struct.fields.map(f =>
      if (pks.contains(f.name)) f.copy(nullable = false) else f))
    TableSchema(withPkNullability, primaryKeys = pks)
  }

  private final case class ColDef(
      name: String,
      cdcType: CdcType,
      inlinePrimaryKey: Boolean,
      comment: Option[String])

  /** `name TYPE [UNSIGNED] [ZEROFILL] [CHARACTER SET ..] [NOT NULL|NULL]
    * [DEFAULT ..] [AUTO_INCREMENT] [PRIMARY KEY] [COMMENT '..']`
    */
  private def parseColumnDef(d: String, tinyInt1AsBoolean: Boolean): ColDef = {
    val toks = tokenize(d)
    require(toks.size >= 2, s"Unparseable column definition: $d")
    val name = unquote(toks.head)
    // type = base word + optional (args) + optional UNSIGNED/ZEROFILL
    val sb = new StringBuilder(toks(1))
    var i = 2
    if (i < toks.size && toks(i).startsWith("(")) { sb.append(toks(i)); i += 1 }
    while (i < toks.size &&
      Set("UNSIGNED", "SIGNED", "ZEROFILL").contains(toks(i).toUpperCase)) {
      sb.append(' ').append(toks(i)); i += 1
    }
    val rest = toks.drop(i).map(_.toUpperCase)
    val notNull = rest.sliding(2).exists(_ == Seq("NOT", "NULL"))
    val pk = rest.sliding(2).exists(_ == Seq("PRIMARY", "KEY"))
    val comment = rest.indexOf("COMMENT") match {
      case idx if idx >= 0 && idx + 1 < toks.size - i =>
        Some(unquote(toks(i + idx + 1)))
      case _ => None
    }
    val t = CdcType.fromMySql(sb.toString, tinyInt1AsBoolean)
      .withNullable(!(notNull || pk))
    ColDef(name, t, pk, comment)
  }

  // ----------------------------------------------------------------- ALTER

  private val NonColumnDrops =
    Set("PRIMARY", "INDEX", "KEY", "FOREIGN", "CONSTRAINT", "CHECK", "PARTITION")

  private def parseAlterClauses(
      tid: TableId,
      clauses: String,
      tinyInt1AsBoolean: Boolean,
      currentSchema: Option[TableSchema]): Seq[SchemaChangeEvent] = {
    // events must come out in clause order (DROP a, ADD a ≠ ADD a, DROP a);
    // only CONSECUTIVE ADD clauses merge into one AddColumnEvent, matching
    // the listener's per-run batching
    val events = Seq.newBuilder[SchemaChangeEvent]
    var pendingAdds = Seq.newBuilder[AddColumnEvent.ColumnWithPosition]
    var hasPending = false
    def flushAdds(): Unit = {
      val a = pendingAdds.result()
      if (a.nonEmpty) events += AddColumnEvent(tid, a)
      pendingAdds = Seq.newBuilder; hasPending = false
    }

    splitTopLevel(clauses, ',').map(_.trim).filter(_.nonEmpty).foreach { clause =>
      val u = clause.toUpperCase
      if (u.startsWith("ADD")) {
        val body = clause.replaceFirst("(?is)^ADD\\s+(COLUMN\\s+)?", "")
        if (body.startsWith("(")) { // ADD COLUMN (a INT, b TEXT)
          splitTopLevel(body.stripPrefix("(").stripSuffix(")"), ',').foreach { d =>
            pendingAdds += addColumn(d.trim, tinyInt1AsBoolean)
          }
        } else pendingAdds += addColumn(body, tinyInt1AsBoolean)
        hasPending = true
      } else {
        if (hasPending) flushAdds()
        if (u.startsWith("DROP ")) {
          val target = tokenize(clause.replaceFirst("(?is)^DROP\\s+(COLUMN\\s+)?", "")).head
          if (!NonColumnDrops.contains(target.toUpperCase))
            events += DropColumnEvent(tid, Seq(unquote(target)))
        } else if (u.startsWith("RENAME COLUMN")) {
          val m = "(?is)RENAME\\s+COLUMN\\s+(\\S+)\\s+TO\\s+(\\S+)".r.findFirstMatchIn(clause).get
          events += RenameColumnEvent(tid, Map(unquote(m.group(1)) -> unquote(m.group(2))))
        } else if (u.startsWith("CHANGE")) {
          // CHANGE [COLUMN] old new type ... — rename + (maybe) type change
          val toks = tokenize(clause.replaceFirst("(?is)^CHANGE\\s+(COLUMN\\s+)?", ""))
          val (oldName, newName) = (unquote(toks(0)), unquote(toks(1)))
          val newCol = parseColumnDef((toks.drop(1)).mkString(" "), tinyInt1AsBoolean)
          if (oldName != newName) events += RenameColumnEvent(tid, Map(oldName -> newName))
          // suppress the type event ONLY when the declared CDC type is
          // provably unchanged. The Spark physical type is lossy
          // (VARCHAR(10) and VARCHAR(20) are both StringType), so compare at
          // the CDC level via the fromSpark round-trip: if the stored Spark
          // type does not uniquely determine the declared type (lengths,
          // precisions), emit the event — a redundant AlterColumnTypeEvent is
          // a no-op downstream, a suppressed real one loses the change
          // (reference listener emits on actual declared-type difference).
          val unchanged = currentSchema.exists { s =>
            s.struct.fields.find(_.name == oldName).exists { f =>
              CdcTypes.fromSpark(f.dataType, newCol.cdcType.nullable) == newCol.cdcType
            }
          }
          if (!unchanged) events += AlterColumnTypeEvent(tid, Map(newName -> newCol.cdcType))
        } else if (u.startsWith("MODIFY")) {
          val col = parseColumnDef(
            clause.replaceFirst("(?is)^MODIFY\\s+(COLUMN\\s+)?", ""), tinyInt1AsBoolean)
          events += AlterColumnTypeEvent(tid, Map(col.name -> col.cdcType))
        }
        // RENAME TO / engine options / index ops: not one of the seven kinds
      }
    }
    flushAdds()
    events.result()
  }

  private def addColumn(d: String, tinyInt1AsBoolean: Boolean): AddColumnEvent.ColumnWithPosition = {
    val u = d.toUpperCase
    val (core, pos) =
      "(?is)(.*?)\\s+AFTER\\s+(\\S+)\\s*$".r.findFirstMatchIn(d) match {
        case Some(m) => (m.group(1), AddColumnEvent.After(unquote(m.group(2))))
        case None =>
          if (u.endsWith(" FIRST")) (d.substring(0, d.length - 6), AddColumnEvent.First)
          else (d, AddColumnEvent.Last)
      }
    val col = parseColumnDef(core.trim, tinyInt1AsBoolean)
    AddColumnEvent.ColumnWithPosition(col.name, col.cdcType, pos, col.comment)
  }

  // ----------------------------------------------------------------- lexing

  /** Split on `sep` at paren-depth 0, outside quotes. */
  private[mysql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().filter(_.trim.nonEmpty)
  }

  /** Whitespace-tokenize keeping quoted strings and parenthesized arg lists
    * as single tokens; a '(' immediately after a word (type args) stays glued.
    */
  private[mysql] def tokenize(s: String): Vector[String] = {
    val toks = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    def flush(): Unit = { if (cur.nonEmpty) { toks += cur.toString; cur.clear() } }
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => if (depth == 0 && cur.nonEmpty && cur.last.isLetterOrDigit) {
          // glued type args: VARCHAR(255)
        } else flush()
          depth += 1; cur += c
        case ')' => depth -= 1; cur += c; if (depth == 0) { /* keep glued */ }
        case w if w.isWhitespace && depth == 0 => flush()
        case _ => cur += c
      }
    }
    flush()
    toks.result()
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '`' || t.head == '\'' || t.head == '"') && t.last == t.head)
      t.substring(1, t.length - 1)
    else t
  }
}
