package graft.sinks

import graft.core._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the event-sequence assertion surface: the render format
  * must transcribe the reference ITCases' `outCaptor` lines 1:1 (minus the
  * tableId prefix), and the unified log must interleave DDL with data in
  * application order — the whole point is distinguishing a correct -U/+U
  * image pair from a compensating wrong one.
  */
class EventRenderSpec extends AnyFunSuite {

  private val t = TableId.parse("db.t")

  test("data render matches the reference DataChangeEvent.toString shape") {
    assert(EventRender.data("INSERT", Seq.empty, Seq("1", "Alice", 18), Map.empty) ==
      "before=[], after=[1, Alice, 18], op=INSERT, meta=()")
    assert(EventRender.data("UPDATE", Seq("2", ""), Seq("2", "x"), Map("op_ts" -> "5")) ==
      "before=[2, ], after=[2, x], op=UPDATE, meta=({op_ts=5})")
    assert(EventRender.data("DELETE", Seq("1", null), Seq.empty, Map.empty) ==
      "before=[1, null], after=[], op=DELETE, meta=()")
  }

  test("ddl render: add positions and DEFAULT expressions") {
    val add = AddColumnEvent(t, Seq(
      AddColumnEvent.ColumnWithPosition("a", CdcTypes.StringT(),
        AddColumnEvent.After("x")),
      AddColumnEvent.ColumnWithPosition("b", CdcTypes.StringT(),
        defaultExpr = Some("flink"))))
    assert(EventRender.ddl(add) == "add:a AFTER x,b DEFAULT 'flink'")
    assert(EventRender.ddl(RenameColumnEvent(t, Map("a" -> "b"))) == "rename:a->b")
    assert(EventRender.ddl(DropColumnEvent(t, Seq("a"))) == "drop:a")
  }

  test("unified log interleaves effective DDL with recorded data per table") {
    val db = new MemoryDatabase(recordEvents = true)
    val schema = TableSchema(
      StructType(Seq(StructField("id", StringType))), primaryKeys = Seq("id"))
    db.applySchemaChange(CreateTableEvent(t, schema))
    db.recordDataEvents(t, Seq(EventRender.data("INSERT", Seq.empty, Seq("1"), Map.empty)))
    db.applySchemaChange(AddColumnEvent(t,
      Seq(AddColumnEvent.ColumnWithPosition("v", CdcTypes.StringT()))))
    db.recordDataEvents(t, Seq(EventRender.data("INSERT", Seq.empty, Seq("2", "x"), Map.empty)))
    // a re-announced CREATE of a known table is not effective: not recorded
    db.applySchemaChange(CreateTableEvent(t, schema))
    assert(db.eventHistory(t) == Seq(
      "create:id",
      "before=[], after=[1], op=INSERT, meta=()",
      "add:v",
      "before=[], after=[2, x], op=INSERT, meta=()"))
    // other tables' events don't leak in
    assert(db.eventHistory(TableId.parse("db.other")).isEmpty)
  }

  test("AlterColumnType converts values already stored under the old type") {
    val db = new MemoryDatabase()
    val t2 = TableId.parse("db.widen")
    db.applySchemaChange(CreateTableEvent(t2, TableSchema(
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))),
      primaryKeys = Seq("id"))))
    val spark = graft.SparkTestBase.spark
    import org.apache.spark.sql.Row
    val rows = new java.util.ArrayList[Row](); rows.add(Row(7, "a"))
    db.writeBatch(t2,
      spark.createDataFrame(rows, StructType(Seq(
        StructField("id", IntegerType), StructField("v", StringType)))),
      spark.createDataFrame(new java.util.ArrayList[Row](),
        StructType(Seq(StructField("id", IntegerType)))))
    db.applySchemaChange(AlterColumnTypeEvent(t2, Map("id" -> CdcTypes.BigIntT())))
    assert(db.rowsOf(t2) == Seq(Seq(7L, "a")),
      s"Int stored pre-widening must read back as Long, got ${db.rowsOf(t2)}")
  }
}
