package graft.sinks

import graft.SparkTestBase
import graft.core._
import graft.core.CdcTypes._
import graft.pipeline.SinkDef
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Dedicated OceanBase pipeline sink: catalog DDL pinned to the
  * reference's exact strings (`OceanBaseMySQLCatalogTest` pins the
  * ADD COLUMN shape), tenant-dialect discovery, Oracle-mode refusal,
  * the wire double's validate-before-mutate, end-to-end upsert/delete
  * writes, and the memstore back-pressure gate. */
class OceanBaseSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val tid = TableId.parse("test.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("bal", DoubleType))),
    primaryKeys = Seq("id"))

  test("catalog DDL strings match the reference's pinned shapes") {
    // the exact string the reference's own OceanBaseMySQLCatalogTest pins
    assert(OceanBaseMySqlCatalog.buildAlterAddColumnsSql("test", "test", Seq(
      OceanBaseColumn("age", "varchar(10)", nullable = true,
        comment = Some("age")))) ==
      "ALTER TABLE `test`.`test` ADD COLUMN `age` VARCHAR(10) NULL COMMENT \"age\";")
    assert(OceanBaseMySqlCatalog.buildCreateDatabaseSql("`db`", ignoreIfExists = true) ==
      "CREATE DATABASE IF NOT EXISTS `db`;")
    assert(OceanBaseMySqlCatalog.buildAlterDropColumnsSql("d", "t", Seq("a", "b")) ==
      "ALTER TABLE `d`.`t` DROP COLUMN `a`, DROP COLUMN `b`;")
    val create = OceanBaseMySqlCatalog.buildCreateTableSql("d", "t",
      Seq(OceanBaseColumn("id", "INT", nullable = false),
        OceanBaseColumn("v", "VARCHAR(100)")), Seq("id"), ignoreIfExists = true)
    assert(create.startsWith("CREATE TABLE IF NOT EXISTS `d`.`t` (\n"))
    assert(create.contains("`id` INT NOT NULL,\n`v` VARCHAR(100) NULL,\nPRIMARY KEY (`id`)"))
    // identifier quoting doubles backticks; literals escape quotes — the
    // reference's injection tests (nonexistent` OR `1`=`1)
    assert(OceanBaseMySqlCatalog.quote("a`b") == "`a``b`")
    assert(OceanBaseMySqlCatalog.escapeSingleQuote("a'b") == "a\\'b")
  }

  test("type mapping carries OceanBase's real caps") {
    assert(OceanBaseTypes.fromCdc(CharT(256))._1 == "CHAR(256)")
    assert(OceanBaseTypes.fromCdc(CharT(257))._1 == "VARCHAR(257)")
    assert(OceanBaseTypes.fromCdc(VarCharT(262144))._1 == "VARCHAR(262144)")
    val (t, _, defaultAllowed) = OceanBaseTypes.fromCdc(VarCharT(262145))
    assert(t == "TEXT" && !defaultAllowed, "oversize varchar becomes TEXT, default drops")
    assert(OceanBaseTypes.fromCdc(VarBinaryT(1048577))._1 == "LONGBLOB")
    assert(OceanBaseTypes.fromCdc(TimestampT(9))._1 == "DATETIME(6)")
    assert(OceanBaseTypes.fromCdc(ZonedTimestampT(3))._1 == "TIMESTAMP(3)")
    assert(OceanBaseTypes.fromCdc(DecimalT(10, 2))._1 == "DECIMAL(10, 2)")
  }

  test("tenant discovery: mysql mode gets the MySQL catalog, oracle refuses ops") {
    val my = new OceanBaseServerDouble("MYSQL")
    my.start()
    try {
      val cat = OceanBaseCatalogFactory.create(my.host, my.boundPort, "root")
      assert(cat.isInstanceOf[OceanBaseMySqlCatalog])
      cat.createDatabase("d1", ignoreIfExists = false)
      assert(cat.databaseExists("d1") && !cat.databaseExists("nope"))
    } finally my.stop()
    val ora = new OceanBaseServerDouble("ORACLE")
    ora.start()
    try {
      val cat = OceanBaseCatalogFactory.create(ora.host, ora.boundPort, "root")
      assert(cat.isInstanceOf[OceanBaseOracleCatalog])
      val e = intercept[UnsupportedOperationException](cat.databaseExists("d"))
      assert(e.getMessage ==
        "This operation under oracle tenant is not supported currently.")
    } finally ora.stop()
  }

  test("double validates before mutating: bad DDL answers ERR, state untouched") {
    val d = new OceanBaseServerDouble()
    d.start()
    try {
      val c = new OceanBaseWireClient(d.host, d.boundPort, "root")
      try {
        c.query("CREATE DATABASE `db`")
        c.query("CREATE TABLE `db`.`t` (\n`id` BIGINT NOT NULL,\n`v` VARCHAR(10) NULL,\nPRIMARY KEY (`id`)\n) ;")
        // over-cap VARCHAR refuses
        val e1 = intercept[IllegalArgumentException](
          c.query("ALTER TABLE `db`.`t` ADD COLUMN `x` VARCHAR(999999) NULL;"))
        assert(e1.getMessage.contains("262144"))
        // multi-op ALTER where the SECOND op is invalid: nothing applies
        val e2 = intercept[IllegalArgumentException](c.query(
          "ALTER TABLE `db`.`t` ADD COLUMN `ok` INT NULL, ADD COLUMN `bad` WAT NULL;"))
        assert(e2.getMessage.contains("unknown OceanBase type"))
        assert(d.tableColumns("db", "t").map(_.name) == Seq("id", "v"),
          "a failed multi-op ALTER must leave no partial mutation")
        // nullable PRIMARY KEY refuses at create
        val e3 = intercept[IllegalArgumentException](c.query(
          "CREATE TABLE `db`.`t2` (\n`id` BIGINT NULL,\nPRIMARY KEY (`id`)\n) ;"))
        assert(e3.getMessage.contains("NOT NULL"))
        // rename + modify flow through
        c.query("ALTER TABLE `db`.`t` RENAME COLUMN `v` TO `val`")
        c.query("ALTER TABLE `db`.`t` MODIFY COLUMN `val` VARCHAR(20);")
        assert(d.tableColumns("db", "t").find(_.name == "val").get.dataType ==
          "VARCHAR(20)")
      } finally c.close()
    } finally d.stop()
  }

  test("end-to-end: create, evolve, upsert, delete, truncate over the wire") {
    val d = new OceanBaseServerDouble()
    d.start()
    try {
      val sink = new OceanBaseDataSink(d.host, d.boundPort, "root",
        memstoreCheckEnabled = false)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      assert(d.databaseNames.contains("test"))
      assert(d.tableKeysOf("test", "users") == Seq("id"))
      sink.writeBatch(tid,
        Seq((1L, "alice", 10.0), (2L, "bob", 5.0)).toDF("id", "name", "bal"),
        spark.range(0).select($"id"))
      // upsert overwrites, delete removes
      sink.writeBatch(tid,
        Seq((1L, "alice2", 11.0)).toDF("id", "name", "bal"),
        Seq(2L).toDF("id"))
      val rows = d.rowsOf("test", "users")
      assert(rows.size == 1 &&
        rows.head("name").contains("alice2") && rows.head("bal").contains("11.0"))
      // evolution: ADD COLUMN LAST only (reference precondition message)
      sink.applySchemaChange(AddColumnEvent(tid, Seq(
        AddColumnEvent.ColumnWithPosition("age", IntT()))))
      assert(d.tableColumns("test", "users").map(_.name) ==
        Seq("id", "name", "bal", "age"))
      val e = intercept[IllegalArgumentException](
        sink.applySchemaChange(AddColumnEvent(tid, Seq(
          AddColumnEvent.ColumnWithPosition("first_col", IntT(),
            AddColumnEvent.First)))))
      assert(e.getMessage.contains("only supports add the column to the last"))
      sink.applySchemaChange(RenameColumnEvent(tid, Map("age" -> "years")))
      assert(d.tableColumns("test", "users").map(_.name).contains("years"))
      sink.applySchemaChange(TruncateTableEvent(tid))
      assert(d.rowsOf("test", "users").isEmpty)
      // pk values with quotes survive literal escaping
      sink.writeBatch(tid,
        Seq((3L, "o'hara", 1.0, 30)).toDF("id", "name", "bal", "years"),
        spark.range(0).select($"id"))
      assert(d.rowsOf("test", "users").head("name").contains("o'hara"))
    } finally d.stop()
  }

  test("batched deletes: single-key IN lists and composite-key OR groups") {
    // the sink batches deletes (one statement per bufferSize keys, the OB
    // record flusher's shape) — the double's grammar covers both forms
    val d = new OceanBaseServerDouble()
    d.start()
    try {
      val c = new OceanBaseWireClient(d.host, d.boundPort, "root")
      try {
        c.query("CREATE DATABASE `db`")
        c.query("CREATE TABLE `db`.`t` (\n`a` BIGINT NOT NULL,\n`b` BIGINT NOT NULL,\n`v` VARCHAR(10) NULL,\nPRIMARY KEY (`a`, `b`)\n) ;")
        c.query("INSERT INTO `db`.`t` (`a`, `b`, `v`) VALUES (1, 1, 'x'), (1, 2, 'y'), (2, 1, 'z')")
        val r = c.query(
          "DELETE FROM `db`.`t` WHERE (`a`=1 AND `b`=2) OR (`a`=2 AND `b`=1)")
        assert(r.affected == 2)
        assert(d.rowsOf("db", "t").map(m => (m("a").get, m("b").get)) ==
          Seq(("1", "1")))
        c.query("CREATE TABLE `db`.`s` (\n`k` BIGINT NOT NULL,\n`v` VARCHAR(5) NULL,\nPRIMARY KEY (`k`)\n) ;")
        c.query("INSERT INTO `db`.`s` (`k`, `v`) VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        assert(c.query("DELETE FROM `db`.`s` WHERE `k` IN (1, 3)").affected == 2)
        assert(d.rowsOf("db", "s").map(_("k").get) == Seq("2"))
      } finally c.close()
    } finally d.stop()
    // and through the sink: composite-key retraction takes the OR shape
    val d2 = new OceanBaseServerDouble()
    d2.start()
    try {
      val tid2 = TableId.parse("test.pairs")
      val sch = TableSchema(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false),
        StructField("v", StringType))), primaryKeys = Seq("a", "b"))
      val sink = new OceanBaseDataSink(d2.host, d2.boundPort, "root",
        memstoreCheckEnabled = false)
      sink.applySchemaChange(CreateTableEvent(tid2, sch))
      sink.writeBatch(tid2,
        Seq((1L, 1L, "x"), (1L, 2L, "y"), (2L, 1L, "z")).toDF("a", "b", "v"),
        spark.range(0).select($"id".as("a"), $"id".as("b")))
      sink.writeBatch(tid2,
        Seq.empty[(Long, Long, String)].toDF("a", "b", "v"),
        Seq((1L, 2L), (2L, 1L)).toDF("a", "b"))
      assert(d2.rowsOf("test", "pairs").map(m => (m("a").get, m("b").get)) ==
        Seq(("1", "1")))
    } finally d2.stop()
  }

  test("memstore back-pressure: writes wait while over threshold, fail when stuck") {
    val d = new OceanBaseServerDouble()
    d.start()
    try {
      val sink = new OceanBaseDataSink(d.host, d.boundPort, "root",
        memstoreCheckEnabled = true, memstoreThreshold = 0.9,
        memstoreCheckIntervalMs = 10L, memstoreMaxChecks = 3)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      d.setMemstore(95, 100) // over threshold: the write must NOT land
      val e = intercept[org.apache.spark.SparkException] {
        sink.writeBatch(tid, Seq((1L, "a", 1.0)).toDF("id", "name", "bal"),
          spark.range(0).select($"id"))
      }
      assert(Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
        .contains("memstore"))
      d.setMemstore(10, 100) // back under: the write flows
      sink.writeBatch(tid, Seq((1L, "a", 1.0)).toDF("id", "name", "bal"),
        spark.range(0).select($"id"))
      assert(d.rowsOf("test", "users").size == 1)
    } finally d.stop()
  }

  test("YAML registry: sink.type oceanbase with username resolves the dedicated sink") {
    val d = new OceanBaseServerDouble()
    d.start()
    try {
      val sink = DataSinks.forDef(spark, SinkDef("oceanbase", None, Map(
        "url" -> d.url, "username" -> "root", "password" -> "pw",
        "memstore-check.enabled" -> "false")))
      assert(sink.isInstanceOf[OceanBaseDataSink])
      intercept[IllegalArgumentException](DataSinks.forDef(spark,
        SinkDef("oceanbase", None, Map("url" -> d.url, "username" -> "root"))))
      // legacy compat: no username keeps the mysql-wire JDBC alias
      assert(DataSinks.forDef(spark, SinkDef("oceanbase", None,
        Map("url" -> "jdbc:none"))).isInstanceOf[JdbcUpsertSink])
    } finally d.stop()
  }
}
