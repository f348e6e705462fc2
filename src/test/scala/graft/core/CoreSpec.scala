package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TableIdSpec extends AnyFunSuite {
  test("parse 1/2/3-part identifiers") {
    assert(TableId.parse("t1") == TableId("", "", "t1"))
    assert(TableId.parse("db.t1") == TableId("", "db", "t1"))
    assert(TableId.parse("ns.db.t1") == TableId("ns", "db", "t1"))
    assert(TableId.parse("db.t1").identifier == "db.t1")
  }
}

class SelectorsSpec extends AnyFunSuite {
  // scenarios mirror flink-cdc-common/src/test/.../SelectorsTest.java semantics
  test("exact and regex matching per part") {
    val s = Selectors.parse("mydb.orders")
    assert(s.isMatch(TableId.parse("mydb.orders")))
    assert(!s.isMatch(TableId.parse("mydb.orders2")))
    assert(!s.isMatch(TableId.parse("otherdb.orders")))
  }
  test("regex table name") {
    val s = Selectors.parse("mydb.t[0-9]+")
    assert(s.isMatch(TableId.parse("mydb.t1")))
    assert(s.isMatch(TableId.parse("mydb.t42")))
    assert(!s.isMatch(TableId.parse("mydb.tx")))
  }
  test("comma-separated alternatives") {
    val s = Selectors.parse("db1.orders, db2.users")
    assert(s.isMatch(TableId.parse("db1.orders")))
    assert(s.isMatch(TableId.parse("db2.users")))
    assert(!s.isMatch(TableId.parse("db1.users")))
  }
  test("case-insensitive match (reference Predicates.includes uses CASE_INSENSITIVE)") {
    val s = Selectors.parse("MyDB.Orders")
    assert(s.isMatch(TableId.parse("mydb.orders")))
  }
  test("escaped dot survives splitting and becomes regex any-char (reference semantics)") {
    // Predicates.RegExSplitterByDot strips the escape after splitting, so `\.`
    // ends up as the regex `.` (any char) — Debezium-style patterns.
    val s = Selectors.parse("mydb.a\\.b")
    assert(s.isMatch(TableId("", "mydb", "a.b")))
    assert(s.isMatch(TableId("", "mydb", "aXb")))
  }
  test("single-part selector matches bare table ids") {
    val s = Selectors.parse("orders")
    assert(s.isMatch(TableId("orders")))
    assert(!s.isMatch(TableId("users")))
  }
  test("wildcard component via escaped dot-star (docs: `mydb.\\.*`)") {
    val s = Selectors.parse("mydb.\\.*")
    assert(s.isMatch(TableId.parse("mydb.anything")))
    assert(!s.isMatch(TableId.parse("other.anything")))
  }
}

class CdcTypesSpec extends AnyFunSuite {
  import CdcTypes._
  import org.apache.spark.sql.types._

  test("spark mapping per SURVEY §1.3") {
    assert(BooleanT().toSpark == BooleanType)
    assert(TinyIntT().toSpark == ByteType)
    assert(SmallIntT().toSpark == ShortType)
    assert(IntT().toSpark == IntegerType)
    assert(BigIntT().toSpark == LongType)
    assert(FloatT().toSpark == FloatType)
    assert(DoubleT().toSpark == DoubleType)
    assert(DecimalT(20, 2).toSpark == DecimalType(20, 2))
    assert(StringT().toSpark == StringType)
    assert(BytesT().toSpark == BinaryType)
    assert(DateT().toSpark == DateType)
    assert(TimeT(3).toSpark == IntegerType) // millis-of-day
    assert(TimestampT(6).toSpark == TimestampNTZType)
    assert(LocalZonedTimestampT(6).toSpark == TimestampType)
    assert(ArrayT(FloatT()).toSpark == ArrayType(FloatType, containsNull = true))
  }

  test("mysql type mapping incl. unsigned widening (MySqlTypeUtils.java:116-260)") {
    assert(CdcType.fromMySql("INT") == IntT())
    assert(CdcType.fromMySql("INT UNSIGNED") == BigIntT())
    assert(CdcType.fromMySql("BIGINT UNSIGNED") == DecimalT(20, 0))
    assert(CdcType.fromMySql("TINYINT(1)") == BooleanT())
    assert(CdcType.fromMySql("TINYINT(1)", tinyInt1AsBoolean = false) == TinyIntT())
    assert(CdcType.fromMySql("TINYINT UNSIGNED") == SmallIntT())
    assert(CdcType.fromMySql("VARCHAR(255)") == VarCharT(255))
    assert(CdcType.fromMySql("DECIMAL(10,2)") == DecimalT(10, 2))
    assert(CdcType.fromMySql("JSON") == StringT())
    assert(CdcType.fromMySql("GEOMETRY") == StringT())
    assert(CdcType.fromMySql("DATETIME(3)") == TimestampT(3))
    assert(CdcType.fromMySql("TIMESTAMP(6)") == LocalZonedTimestampT(6))
    assert(CdcType.fromMySql("ENUM('a','b')") == StringT())
  }

  test("round trip fromSpark/toSpark") {
    val types: Seq[DataType] =
      Seq(BooleanType, IntegerType, LongType, DoubleType, StringType, DateType, TimestampType)
    types.foreach(t => assert(fromSpark(t).toSpark == t))
  }
}

class SchemaMergingSpec extends AnyFunSuite {
  import CdcTypes._
  import SchemaMerging._

  // cases mirror SchemaMergingUtilsTest / SchemaUtilsTest in the reference
  test("identical types merge to themselves") {
    assert(leastCommonType(IntT(), IntT()) == IntT())
  }
  test("integer widening chain") {
    assert(leastCommonType(TinyIntT(), SmallIntT()) == SmallIntT())
    assert(leastCommonType(SmallIntT(), IntT()) == IntT())
    assert(leastCommonType(IntT(), BigIntT()) == BigIntT())
    assert(leastCommonType(TinyIntT(), BigIntT()) == BigIntT())
  }
  test("int + float family") {
    // INT's tree has DECIMAL(38,0) before DOUBLE; FLOAT's tree is FLOAT<DOUBLE<STRING
    assert(leastCommonType(IntT(), DoubleT()) == DoubleT())
    assert(leastCommonType(SmallIntT(), FloatT()) == FloatT())
    assert(leastCommonType(FloatT(), DoubleT()) == DoubleT())
  }
  test("INT + VARCHAR → STRING (CDC rule, differs from Spark TypeCoercion)") {
    assert(leastCommonType(IntT(), StringT()) == StringT())
    assert(leastCommonType(BooleanT(), IntT()) == StringT())
  }
  test("decimal merges (SchemaMergingUtils.mergeDecimalType)") {
    assert(leastCommonType(DecimalT(10, 2), DecimalT(8, 4)) == DecimalT(12, 4))
    assert(leastCommonType(DecimalT(10, 2), IntT()) == DecimalT(12, 2))
    assert(leastCommonType(DecimalT(5, 0), BigIntT()) == DecimalT(19, 0))
    assert(leastCommonType(DecimalT(10, 2), DoubleT()) == StringT())
  }
  test("timestamp family merges by level and precision") {
    assert(leastCommonType(TimestampT(3), TimestampT(6)) == TimestampT(6))
    assert(
      leastCommonType(TimestampT(6), LocalZonedTimestampT(3)) == LocalZonedTimestampT(6))
    assert(leastCommonType(DateT(), TimestampT(9)) == TimestampT(9))
  }
  test("nullability ORs and is restored") {
    assert(leastCommonType(IntT(nullable = false), IntT(nullable = true)) == IntT(nullable = true))
    assert(
      leastCommonType(IntT(nullable = false), BigIntT(nullable = false)) ==
        BigIntT(nullable = false))
  }
  test("leastCommonSchema widens common columns, keeps others UNCHANGED") {
    // reference getLeastCommonSchema (:158-170): current-only columns copy
    // as-is and upcoming-only columns append with THEIR declared type —
    // only columns present on BOTH sides merge through the lattice
    val cur = Seq("id" -> IntT(nullable = false), "name" -> StringT(), "x" -> IntT())
    val up = Seq("id" -> BigIntT(), "name" -> StringT(), "y" -> DoubleT(nullable = false))
    val merged = leastCommonSchema(cur, up)
    assert(merged == Seq(
      "id" -> BigIntT(),
      "name" -> StringT(),
      "x" -> IntT(), // missing from upcoming → kept as-is
      "y" -> DoubleT(nullable = false))) // appended with its own declared type
  }
  test("leastCommonSchema ORs nullability even when the base type is unchanged") {
    // reference getLeastCommonSchema has no same-type shortcut: a NOT NULL
    // current column whose upcoming twin is nullable must widen to nullable,
    // or upcoming null rows violate the declared schema downstream — and
    // schemaDifference must emit the nullability-only AlterColumnType
    // (reference getSchemaDifference compares with Objects.equals)
    val cur = Seq("a" -> IntT(nullable = false))
    val up = Seq("a" -> IntT(nullable = true))
    val merged = leastCommonSchema(cur, up)
    assert(merged == Seq("a" -> IntT(nullable = true)))
    val events = schemaDifference(TableId.parse("db.t"), cur, merged)
    assert(events == Seq(AlterColumnTypeEvent(
      TableId.parse("db.t"), Map("a" -> IntT(nullable = true)))))
  }

  test("schemaDifference emits AddColumn (anchored) then AlterColumnType") {
    // reference getSchemaDifference:209-244 — adds FIRST with explicit
    // AFTER anchors, then the type widenings (the composer ITCases assert
    // this derived-event order, FlinkPipelineComposerITCase.java:838-839)
    val t = TableId.parse("db.t")
    val before = Seq("id" -> IntT(), "name" -> StringT())
    val after = Seq("id" -> BigIntT(), "name" -> StringT(), "z" -> DoubleT())
    val events = schemaDifference(t, before, after)
    assert(events.size == 2)
    assert(events.head match {
      case AddColumnEvent(`t`, cols) =>
        cols.map(c => (c.name, c.position)) ==
          Seq(("z", AddColumnEvent.After("name")))
      case _ => false
    })
    assert(events(1) == AlterColumnTypeEvent(t, Map("id" -> BigIntT())))
    // a LEADING new column anchors FIRST
    val lead = schemaDifference(t, before,
      Seq("z" -> DoubleT(), "id" -> IntT(), "name" -> StringT()))
    assert(lead == Seq(AddColumnEvent(t,
      Seq(AddColumnEvent.ColumnWithPosition("z", DoubleT(), AddColumnEvent.First)))))
  }
  test("isCompatible") {
    assert(isCompatible(Some(BigIntT()), IntT()))
    assert(!isCompatible(Some(IntT()), BigIntT()))
    assert(!isCompatible(None, IntT()))
  }
}

class SchemaManagerSpec extends AnyFunSuite {
  import CdcTypes._
  import org.apache.spark.sql.types._

  private def schema(cols: (String, CdcType)*): TableSchema =
    TableSchema(SchemaMerging.toStruct(cols))

  test("create/add/rename/drop/alter lifecycle with versions") {
    val mgr = new SchemaManager
    val t = TableId.parse("db.t")
    mgr.applySchemaChange(CreateTableEvent(t, schema("id" -> IntT(), "name" -> StringT())
      .copy(primaryKeys = Seq("id"))))
    assert(mgr.latest(t).get.columnNames == Seq("id", "name"))

    mgr.applySchemaChange(
      AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("age", IntT(),
        AddColumnEvent.After("id")))))
    assert(mgr.latest(t).get.columnNames == Seq("id", "age", "name"))

    mgr.applySchemaChange(RenameColumnEvent(t, Map("name" -> "full_name")))
    assert(mgr.latest(t).get.columnNames == Seq("id", "age", "full_name"))

    mgr.applySchemaChange(AlterColumnTypeEvent(t, Map("id" -> BigIntT())))
    assert(mgr.latest(t).get.struct("id").dataType == LongType)

    mgr.applySchemaChange(DropColumnEvent(t, Seq("age")))
    assert(mgr.latest(t).get.columnNames == Seq("id", "full_name"))

    // bounded retention: the newest VERSIONS_TO_KEEP (= 3, reference
    // `SchemaManager.java:58`) survive; older epochs evict
    assert(mgr.versionOf(t, 0).isEmpty)
    assert(mgr.versionOf(t, 1).isEmpty)
    assert(mgr.versionOf(t, 2).get.columnNames == Seq("id", "age", "full_name"))
    assert(mgr.versionOf(t, 4).get.columnNames == Seq("id", "full_name"))
  }
}
