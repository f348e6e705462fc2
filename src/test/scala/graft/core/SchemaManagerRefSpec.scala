package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `SchemaManagerTest.java` (flink-cdc-runtime/src/test/.../schema/common/)
  * transcribed onto [[SchemaManager]] — the CUSTOMERS fixture, every event
  * kind's application, historical versions, and the 3-version retention
  * bound. The reference keeps separate original/evolved maps; graft's
  * composer holds one manager instance per role, so one manager covers
  * both halves of each reference test pair. The serde tests are n/a by
  * design (SURVEY §1.4 — state rides Tungsten/checkpoint files, not custom
  * serializers).
  */
class SchemaManagerRefSpec extends AnyFunSuite {

  private val customers = TableId.parse("my_company.my_branch.customers")
  private def customersSchema = TableSchema(
    StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType),
      StructField("phone", LongType))),
    primaryKeys = Seq("id"))

  private def fresh(): SchemaManager = {
    val m = new SchemaManager
    m.applySchemaChange(CreateTableEvent(customers, customersSchema))
    m
  }

  // testHandlingCreateTableEvent:62 — a redundant create must not throw
  test("create table event") {
    val m = fresh()
    assert(m.latest(customers).contains(customersSchema))
    m.applySchemaChange(CreateTableEvent(customers, customersSchema))
    assert(m.latest(customers).exists(_.columnNames == Seq("id", "name", "phone")))
  }

  // testHandlingAddColumnEvent:75 — all four positions + a DEFAULT column in
  // one event, applied left to right
  test("add column event: positions and default") {
    val m = fresh()
    m.applySchemaChange(AddColumnEvent(customers, Seq(
      AddColumnEvent.ColumnWithPosition("append_last", CdcTypes.BigIntT()),
      AddColumnEvent.ColumnWithPosition("append_first", CdcTypes.BigIntT(),
        AddColumnEvent.First),
      AddColumnEvent.ColumnWithPosition("append_after_id", CdcTypes.BigIntT(),
        AddColumnEvent.After("id")),
      AddColumnEvent.ColumnWithPosition("append_before_phone", CdcTypes.BigIntT(),
        AddColumnEvent.Before("phone")),
      AddColumnEvent.ColumnWithPosition("col_with_default", CdcTypes.BigIntT(),
        defaultExpr = Some("10")))))
    val latest = m.latest(customers).get
    assert(latest.columnNames == Seq(
      "append_first", "id", "append_after_id", "name",
      "append_before_phone", "phone", "append_last", "col_with_default"))
    assert(latest.struct("col_with_default")
      .metadata.getString(AddColumnEvent.DefaultKey) == "10")
    assert(latest.primaryKeys == Seq("id"))
  }

  // testHandlingAlterColumnTypeEvent:115
  test("alter column type event") {
    val m = fresh()
    m.applySchemaChange(AlterColumnTypeEvent(customers, Map("phone" -> CdcTypes.StringT())))
    val latest = m.latest(customers).get
    assert(latest.columnNames == Seq("id", "name", "phone"))
    assert(latest.struct("phone").dataType == StringType)
  }

  // testHandlingDropColumnEvent:152 — two columns in one drop
  test("drop column event") {
    val m = fresh()
    m.applySchemaChange(DropColumnEvent(customers, Seq("name", "phone")))
    assert(m.latest(customers).get.columnNames == Seq("id"))
  }

  // testHandlingRenameColumnEvent:182
  test("rename column event") {
    val m = fresh()
    m.applySchemaChange(RenameColumnEvent(customers, Map("name" -> "new_name")))
    assert(m.latest(customers).get.columnNames == Seq("id", "new_name", "phone"))
  }

  // testGettingHistoricalSchema:216 — version 1 is the first rename's result
  test("historical schema versions") {
    val m = fresh()
    m.applySchemaChange(RenameColumnEvent(customers, Map("name" -> "new_name")))
    m.applySchemaChange(RenameColumnEvent(customers, Map("phone" -> "new_phone")))
    assert(m.versionOf(customers, 1).get.columnNames == Seq("id", "new_name", "phone"))
    assert(m.versionOf(customers, 2).get.columnNames == Seq("id", "new_name", "new_phone"))
  }

  // testVersionCleanup:254 — after a fourth version, version 0 is evicted
  // (VERSIONS_TO_KEEP = 3, `SchemaManager.java:58`)
  test("version cleanup keeps the newest three") {
    val m = fresh()
    m.applySchemaChange(RenameColumnEvent(customers, Map("name" -> "new_name")))
    m.applySchemaChange(RenameColumnEvent(customers, Map("phone" -> "new_phone")))
    m.applySchemaChange(RenameColumnEvent(customers, Map("new_phone" -> "new_phone_2")))
    assert(m.versionOf(customers, 0).isEmpty)
    assert(m.versionOf(customers, 1).isDefined)
    assert(m.versionOf(customers, 3).get.columnNames == Seq("id", "new_name", "new_phone_2"))
  }
}
