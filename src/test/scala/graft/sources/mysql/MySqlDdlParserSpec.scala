package graft.sources.mysql

import graft.core._
import graft.core.CdcTypes._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Scenarios mirror the reference's
  * `MySqlAntlrDdlParserTest` / `CustomAlterTableParserListener` behaviors.
  */
class MySqlDdlParserSpec extends AnyFunSuite {

  test("CREATE TABLE: columns, types, inline + table-level PK, NOT NULL") {
    val Seq(ev: CreateTableEvent) = MySqlDdlParser.parse(
      """CREATE TABLE `db`.`orders` (
        |  `id` BIGINT NOT NULL AUTO_INCREMENT,
        |  `name` VARCHAR(255) DEFAULT 'x',
        |  `amount` DECIMAL(10,2),
        |  `flag` TINYINT(1),
        |  `payload` JSON,
        |  `created` DATETIME(3) NOT NULL,
        |  PRIMARY KEY (`id`),
        |  KEY idx_name (`name`)
        |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;""".stripMargin)
    assert(ev.tableId == TableId.of("db", "orders"))
    val s = ev.schema
    assert(s.primaryKeys == Seq("id"))
    assert(s.struct.fieldNames.toSeq ==
      Seq("id", "name", "amount", "flag", "payload", "created"))
    assert(s.struct("id").dataType == LongType && !s.struct("id").nullable)
    assert(s.struct("name").dataType == StringType)
    assert(s.struct("amount").dataType == DecimalType(10, 2))
    assert(s.struct("flag").dataType == BooleanType) // TINYINT(1) toggle
    assert(s.struct("payload").dataType == StringType) // JSON -> STRING
    assert(s.struct("created").dataType == TimestampNTZType && !s.struct("created").nullable)
  }

  test("CREATE TABLE: inline PRIMARY KEY and unsigned widening") {
    val Seq(ev: CreateTableEvent) = MySqlDdlParser.parse(
      "CREATE TABLE t (id INT UNSIGNED PRIMARY KEY, n BIGINT UNSIGNED)")
    assert(ev.schema.primaryKeys == Seq("id"))
    assert(ev.schema.struct("id").dataType == LongType) // INT UNSIGNED -> BIGINT
    assert(ev.schema.struct("n").dataType == DecimalType(20, 0)) // BIGINT UNSIGNED
  }

  test("database context applies to unqualified table names") {
    val Seq(ev) = MySqlDdlParser.parse("TRUNCATE TABLE orders", database = "mydb")
    assert(ev == TruncateTableEvent(TableId.of("mydb", "orders")))
  }

  test("ALTER TABLE ADD COLUMN with position and multi-add") {
    val evs = MySqlDdlParser.parse(
      "ALTER TABLE db.t ADD COLUMN a INT AFTER id, ADD b TEXT FIRST, ADD (c DATE, d FLOAT)")
    val Seq(add: AddColumnEvent) = evs
    assert(add.columns.map(_.name) == Seq("a", "b", "c", "d"))
    assert(add.columns(0).position == AddColumnEvent.After("id"))
    assert(add.columns(1).position == AddColumnEvent.First)
    assert(add.columns(2).position == AddColumnEvent.Last)
    assert(add.columns(0).cdcType == IntT())
    assert(add.columns(3).cdcType == FloatT())
  }

  test("ALTER TABLE DROP / RENAME / MODIFY / CHANGE") {
    assert(MySqlDdlParser.parse("ALTER TABLE t DROP COLUMN old_c") ==
      Seq(DropColumnEvent(TableId("t"), Seq("old_c"))))
    assert(MySqlDdlParser.parse("ALTER TABLE t RENAME COLUMN a TO b") ==
      Seq(RenameColumnEvent(TableId("t"), Map("a" -> "b"))))
    assert(MySqlDdlParser.parse("ALTER TABLE t MODIFY COLUMN c BIGINT NOT NULL") ==
      Seq(AlterColumnTypeEvent(TableId("t"), Map("c" -> BigIntT(nullable = false)))))
    // CHANGE = rename + type
    assert(MySqlDdlParser.parse("ALTER TABLE t CHANGE COLUMN a b VARCHAR(64)") ==
      Seq(
        RenameColumnEvent(TableId("t"), Map("a" -> "b")),
        AlterColumnTypeEvent(TableId("t"), Map("b" -> VarCharT(64)))))
  }

  test("CHANGE with unchanged type against a known schema emits only the rename") {
    val cur = TableSchema(StructType(Seq(StructField("a", IntegerType))))
    val evs = MySqlDdlParser.parse(
      "ALTER TABLE t CHANGE a b INT", currentSchema = Some(cur))
    assert(evs == Seq(RenameColumnEvent(TableId("t"), Map("a" -> "b"))))
  }

  test("CHANGE compares at the CDC level: Spark-type collisions still emit the event") {
    // VARCHAR(10) -> VARCHAR(20) both map to StringType — the lossy Spark
    // compare would swallow the declared-type change; the CDC-level check
    // must emit it (reference listener emits AlterColumnTypeEvent)
    val cur = TableSchema(StructType(Seq(StructField("a", StringType))))
    val evs = MySqlDdlParser.parse(
      "ALTER TABLE t CHANGE a a VARCHAR(20)", currentSchema = Some(cur))
    assert(evs == Seq(AlterColumnTypeEvent(TableId("t"), Map("a" -> VarCharT(20)))))
    // TEXT round-trips to the same CDC type as StringType -> suppressed
    val evs2 = MySqlDdlParser.parse(
      "ALTER TABLE t CHANGE a b TEXT", currentSchema = Some(cur))
    assert(evs2 == Seq(RenameColumnEvent(TableId("t"), Map("a" -> "b"))))
  }

  test("DROP TABLE / TRUNCATE / non-schema statements") {
    assert(MySqlDdlParser.parse("DROP TABLE IF EXISTS db.t") ==
      Seq(DropTableEvent(TableId.of("db", "t"))))
    assert(MySqlDdlParser.parse("TRUNCATE t") == Seq(TruncateTableEvent(TableId("t"))))
    assert(MySqlDdlParser.parse("SET FOREIGN_KEY_CHECKS=0").isEmpty)
    assert(MySqlDdlParser.parse("CREATE INDEX i ON t (c)").isEmpty)
  }

  test("index/constraint ALTER clauses are ignored, ENUM args survive commas") {
    assert(MySqlDdlParser.parse("ALTER TABLE t DROP INDEX idx, DROP PRIMARY KEY").isEmpty)
    assert(MySqlDdlParser.parse(
      "ALTER TABLE t DROP CONSTRAINT fk1, DROP CHECK c1, DROP PARTITION p0").isEmpty)
    val Seq(ev: CreateTableEvent) =
      MySqlDdlParser.parse("CREATE TABLE t (s ENUM('a','b,c'), n INT)")
    assert(ev.schema.struct.fieldNames.toSeq == Seq("s", "n"))
    assert(ev.schema.struct("s").dataType == StringType)
  }

  test("multi-clause ALTER preserves clause order (drop-then-add != add-then-drop)") {
    val evs = MySqlDdlParser.parse(
      "ALTER TABLE t DROP COLUMN a, ADD COLUMN a VARCHAR(64), ADD b INT, DROP COLUMN c")
    assert(evs == Seq(
      DropColumnEvent(TableId("t"), Seq("a")),
      AddColumnEvent(TableId("t"), Seq(
        AddColumnEvent.ColumnWithPosition("a", VarCharT(64)),
        AddColumnEvent.ColumnWithPosition("b", IntT()))),
      DropColumnEvent(TableId("t"), Seq("c"))))
  }

  test("CREATE TABLE with parenthesized table options / partition clauses") {
    val Seq(ev: CreateTableEvent) = MySqlDdlParser.parse(
      """CREATE TABLE t (id INT NOT NULL PRIMARY KEY, v TEXT)
        |PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (6))""".stripMargin)
    assert(ev.schema.struct.fieldNames.toSeq == Seq("id", "v"))
    assert(ev.schema.primaryKeys == Seq("id"))
  }
}
