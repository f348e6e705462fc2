package graft.pipeline

import graft.SparkTestBase
import graft.core._
import graft.core.CdcTypes._
import graft.operators.{RouteRule, TransformRule}
import graft.sinks.MemoryDatabase
import graft.sources.ValuesSource
import org.scalatest.funsuite.AnyFunSuite

class YamlPipelineParserSpec extends AnyFunSuite {
  // fixture mirrors docs/content/docs/core-concept/transform.md + route.md examples
  val yaml =
    """source:
      |  type: mysql
      |  hostname: localhost
      |  port: 3306
      |  tables: app.\.*
      |sink:
      |  type: values
      |  include.schema.changes: create.table, add.column
      |route:
      |  - source-table: app.\.*
      |    sink-table: ods.ods_<>
      |    replace-symbol: <>
      |transform:
      |  - source-table: app.orders
      |    projection: "*, UPPER(status) AS status_u"
      |    filter: "amount > 10"
      |    primary-keys: id
      |pipeline:
      |  name: test-pipeline
      |  parallelism: 4
      |  schema.change.behavior: EVOLVE
      |""".stripMargin

  test("parses all sections with reference key names") {
    val p = YamlPipelineParser.parse(yaml)
    assert(p.source.sourceType == "mysql")
    assert(p.source.config("tables") == "app.\\.*")
    assert(p.sink.sinkType == "values")
    assert(p.sink.includeSchemaChanges == Seq("create.table", "add.column"))
    assert(p.routes == Seq(RouteRule("app.\\.*", "ods.ods_<>", Some("<>"))))
    assert(p.transforms.head.projection.contains("*, UPPER(status) AS status_u"))
    assert(p.transforms.head.primaryKeys == Seq("id"))
    assert(p.name == "test-pipeline")
    assert(p.parallelism == 4)
    assert(p.schemaChangeBehavior == SchemaChangeBehavior.EVOLVE)
  }

  test("missing source section fails like the reference parser") {
    intercept[IllegalArgumentException](YamlPipelineParser.parse("sink:\n  type: values\n"))
  }

  // YamlPipelineDefinitionParserTest.testValidTimeZone:129 /
  // testInvalidTimeZone:162 — Zone Database IDs, GMT offsets and UTC parse;
  // anything else refuses at SUBMISSION with the reference's exact wording
  test("local-time-zone validates at parse time") {
    def withTz(tz: String) = YamlPipelineParser.parse(
      s"""source:
         |  type: cdc
         |  sourceId: x
         |sink:
         |  type: values
         |pipeline:
         |  local-time-zone: $tz
         |""".stripMargin)
    assert(withTz("Asia/Shanghai").localTimeZone == "Asia/Shanghai")
    assert(withTz("GMT+08:00").localTimeZone == "GMT+08:00")
    assert(withTz("UTC").localTimeZone == "UTC")
    val e = intercept[IllegalArgumentException](withTz("invalid time zone"))
    assert(e.getMessage.contains(
      "Invalid time zone. The valid value should be a Time Zone Database ID"))
  }
}

class SchemaEvolutionSpec extends AnyFunSuite {
  private def schema(cols: (String, CdcType)*): TableSchema =
    TableSchema(SchemaMerging.toStruct(cols), primaryKeys = Seq(cols.head._1))

  private def driver(behavior: SchemaChangeBehavior.Value) = {
    val applied = scala.collection.mutable.ArrayBuffer.empty[SchemaChangeEvent]
    val d = new SchemaEvolutionDriver(behavior, e => applied += e)
    (d, applied)
  }

  val t = TableId.parse("db.t")

  // scenarios mirror flink-cdc-runtime/src/test/.../SchemaEvolveTest.java
  test("LENIENT: add column appended nullable, position stripped") {
    val (d, applied) = driver(SchemaChangeBehavior.LENIENT)
    d.handle(CreateTableEvent(t, schema("id" -> IntT(nullable = false), "v" -> StringT())))
    d.handle(AddColumnEvent(t,
      Seq(AddColumnEvent.ColumnWithPosition("x", IntT(nullable = false),
        AddColumnEvent.First))))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "v", "x"))
    assert(d.evolvedSchemas.latest(t).get.struct("x").nullable)
    assert(applied.size == 2)
  }

  test("LENIENT: drop column is swallowed, rename becomes add") {
    val (d, _) = driver(SchemaChangeBehavior.LENIENT)
    d.handle(CreateTableEvent(t, schema("id" -> IntT(), "v" -> StringT())))
    d.handle(DropColumnEvent(t, Seq("v")))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "v")) // kept
    d.handle(RenameColumnEvent(t, Map("v" -> "v2")))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "v", "v2"))
    // original side tracks the true source schema: v dropped, so the later
    // rename of v is a no-op there
    assert(d.originalSchemas.latest(t).get.columnNames == Seq("id"))
  }

  test("EVOLVE: events applied verbatim") {
    val (d, _) = driver(SchemaChangeBehavior.EVOLVE)
    d.handle(CreateTableEvent(t, schema("id" -> IntT(), "v" -> StringT())))
    d.handle(RenameColumnEvent(t, Map("v" -> "v2")))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "v2"))
    d.handle(DropColumnEvent(t, Seq("v2")))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id"))
  }

  test("IGNORE: only create-table reaches the sink") {
    val (d, applied) = driver(SchemaChangeBehavior.IGNORE)
    d.handle(CreateTableEvent(t, schema("id" -> IntT(), "v" -> StringT())))
    d.handle(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("x", IntT()))))
    assert(applied.size == 1)
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "v"))
    assert(d.originalSchemas.latest(t).get.columnNames == Seq("id", "v", "x"))
  }

  test("EXCEPTION: any evolution throws") {
    val (d, _) = driver(SchemaChangeBehavior.EXCEPTION)
    d.handle(CreateTableEvent(t, schema("id" -> IntT())))
    intercept[IllegalStateException] {
      d.handle(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("x", IntT()))))
    }
  }

  test("TRY_EVOLVE: applier failure swallowed, registry stays AT the sink schema") {
    // reference applyAndUpdateEvolvedSchemaChange order: the sink applies
    // FIRST, the evolved registry records only on success — a registry
    // that ran ahead would make every later coerceBatch target a column
    // the physical sink table lacks, failing every write
    var fail = false
    val d = new SchemaEvolutionDriver(
      SchemaChangeBehavior.TRY_EVOLVE,
      _ => if (fail) throw new RuntimeException("sink DDL failed"))
    d.handle(CreateTableEvent(t, schema("id" -> IntT())))
    fail = true
    val applied =
      d.handle(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("x", IntT()))))
    assert(applied.isEmpty, "a swallowed evolution reports as NOT applied")
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id"),
      "the registry must not run ahead of the real sink schema")
    fail = false
    d.handle(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("y", IntT()))))
    assert(d.evolvedSchemas.latest(t).get.columnNames == Seq("id", "y"),
      "recovery: the next successful evolution still lands")
  }

  test("TRY_EVOLVE: a REGISTRY failure after a successful sink apply propagates") {
    // TRY_EVOLVE swallows only sink limitations. Here the sink accepts
    // (no-op applier) but the registry cannot (the anchor column does not
    // exist): swallowing would leave the physical sink AHEAD of the
    // registry — later coerceBatch would omit a column the sink has — the
    // inverse of the divergence the sink-first order prevents.
    val d = new SchemaEvolutionDriver(SchemaChangeBehavior.TRY_EVOLVE, _ => ())
    d.handle(CreateTableEvent(t, schema("id" -> IntT())))
    intercept[IllegalArgumentException] {
      d.handle(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition(
        "x", IntT(), AddColumnEvent.After("no_such_column")))))
    }
  }

  test("coerce pads missing columns with null and casts") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val target = SchemaMerging.toStruct(Seq("id" -> BigIntT(), "v" -> StringT(),
      "w" -> DoubleT()))
    val out = SchemaDerivator.coerce(df, target)
    assert(out.schema.fields.map(_.dataType.simpleString).toSeq == Seq("bigint", "string",
      "double"))
    assert(out.as[(Long, String, Option[Double])].head() == ((1L, "a", None)))
  }
}

class PipelineComposerSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  // mirrors FlinkPipelineComposerITCase.testSingleSplitSingleTable + transform/route cases
  test("end-to-end: values source -> transform -> route -> memory sink") {
    val t = TableId.parse("default_namespace.default_schema.table1")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty),
      routes = Seq(RouteRule("default_namespace.default_schema.\\.*", "ods.ods_<>",
        Some("<>"))),
      transforms = Seq(TransformRule(
        "default_namespace.default_schema.table1",
        projection = Some("*, col1 || col2 AS col12"),
        filter = Some("col1 <> '3'"))))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)

    composer.createTables(Map(t -> ValuesSource.customersSchema))
    val sinkT = TableId.parse("ods.ods_table1")
    assert(sink.tableIds == Set(sinkT))
    assert(sink.schemaOf(sinkT).get.columnNames == Seq("col1", "col2", "col12"))

    val env = ValuesSource.toEnvelope(spark, ValuesSource.customersSchema,
      ValuesSource.singleTableScript(t))
    composer.processBatch(t, env)

    // script: ins(1),ins(3),ins(5),upd(1->x),del(3); filter col1<>'3' drops row 3 anyway
    val rows = sink.rowsOf(sinkT).map(_.mkString(",")).sorted
    assert(rows == Seq("1,x,1x", "5,6,56"))
  }

  // MysqlE2eITCase.testDanglingDropTableEventInBinlog:467 — a db-level log
  // carries DROP/TRUNCATE for a table the pipeline never announced (dropped
  // before the start offset); the reference's SchemaOperator tolerates the
  // absent schema and the job keeps flowing. Must be a no-op, not a fault.
  test("dangling DROP/TRUNCATE for a never-announced table is a no-op") {
    val known = TableId.parse("db.products")
    val ghost = TableId.parse("db.live_fast")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(known -> ValuesSource.customersSchema))
    assert(composer.processSchemaChange(DropTableEvent(ghost)).isEmpty)
    assert(composer.processSchemaChange(TruncateTableEvent(ghost)).isEmpty)
    // later traffic on the known table still flows
    val env = ValuesSource.toEnvelope(spark, ValuesSource.customersSchema,
      ValuesSource.singleTableScript(known))
    composer.processBatch(known, env)
    assert(sink.rowsOf(known).nonEmpty)
    assert(sink.tableIds == Set(known))
  }

  test("include.schema.changes accepts the reference TAG grammar (dotted + families)") {
    val t = TableId.parse("db.t")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty,
        includeSchemaChanges = Seq("create.table", "add.column"),
        excludeSchemaChanges = Seq.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink) // must not throw on dots
    composer.processSchemaChange(CreateTableEvent(t, ValuesSource.customersSchema))
    assert(sink.tableIds == Set(t))
    // DropColumn is outside the include set: swallowed, sink unchanged
    assert(composer.processSchemaChange(DropColumnEvent(t, Seq("col2"))).isEmpty)
    assert(sink.schemaOf(t).get.columnNames == Seq("col1", "col2"))
    // family tag resolution
    assert(SchemaChangeEventType.ofTag("column").size == 4)
    assert(SchemaChangeEventType.ofTag("all") == SchemaChangeEventType.values.toSeq)
    intercept[IllegalArgumentException](SchemaChangeEventType.ofTag("bogus"))
  }

  test("converter-after-transform SOFT_DELETE retains deleted rows end-to-end") {
    val t = TableId.parse("db.t")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty),
      transforms = Seq(TransformRule("db.t",
        postTransformConverter = Some("SOFT_DELETE"))))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t -> ValuesSource.customersSchema))
    composer.processBatch(t, ValuesSource.toEnvelope(spark, ValuesSource.customersSchema, Seq(
      DataChangeEvent.insert(t, Map("col1" -> "1", "col2" -> "a")),
      DataChangeEvent.delete(t, Map("col1" -> "1", "col2" -> "a")))))
    // the declared converter must reach the data path: the DELETE lands as
    // a before-image INSERT, so the row SURVIVES in the sink
    assert(sink.rowsOf(t).map(_.mkString(",")) == Seq("1,a"))
  }

  test("schema events project through the transform before reaching the sink") {
    import org.apache.spark.sql.types._
    val t = TableId.parse("db.t")
    val s = TableSchema(StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType),
      StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty),
      transforms = Seq(TransformRule("db.t", projection = Some("id, name"))))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t -> s))
    assert(sink.schemaOf(t).get.columnNames == Seq("id", "name"))
    // events on the projected-away column never reach the sink: an Alter
    // would crash the applier on an absent column, an Add would create a
    // phantom column the (always-projecting) data path never populates
    assert(composer.processSchemaChange(
      AlterColumnTypeEvent(t, Map("age" -> graft.core.CdcTypes.BigIntT()))).isEmpty)
    assert(composer.processSchemaChange(
      AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition(
        "extra", graft.core.CdcTypes.StringT())))).isEmpty)
    assert(sink.schemaOf(t).get.columnNames == Seq("id", "name"))
    // an event on a PASS-THROUGH column still evolves the sink
    val applied = composer.processSchemaChange(
      AlterColumnTypeEvent(t, Map("name" -> graft.core.CdcTypes.StringT())))
    assert(applied.nonEmpty)
  }

  test("merge route: two tables with different schemas into one sink table") {
    import org.apache.spark.sql.types._
    val t1 = TableId.parse("db.shard_1")
    val t2 = TableId.parse("db.shard_2")
    val s1 = TableSchema(StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", StringType))), primaryKeys = Seq("id"))
    val s2 = TableSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("w", DoubleType))), primaryKeys = Seq("id"))
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty),
      routes = Seq(RouteRule("db.shard_\\.*", "sink.merged")))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t1 -> s1, t2 -> s2))

    val merged = sink.schemaOf(TableId.parse("sink.merged")).get
    // id widened int+bigint -> bigint; v and w both present nullable
    assert(merged.columnNames == Seq("id", "v", "w"))
    assert(merged.struct("id").dataType == LongType)

    composer.processBatch(t1, ValuesSource.toEnvelope(spark, s1, Seq(
      DataChangeEvent.insert(t1, Map("id" -> 1, "v" -> "a")))))
    composer.processBatch(t2, ValuesSource.toEnvelope(spark, s2, Seq(
      DataChangeEvent.insert(t2, Map("id" -> 2L, "w" -> 3.5)))))
    val rows = sink.rowsOf(TableId.parse("sink.merged")).map(_.mkString(",")).sorted
    assert(rows == Seq("1,a,null", "2,null,3.5"))
  }

  test("TIME column end-to-end: DDL -> evolution -> envelope -> sink as millis-of-day") {
    import graft.sources.mysql.MySqlDdlParser
    import org.apache.spark.sql.types._
    val t = TableId.parse("app.shifts")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    // declared TIME(3) maps to INT millis-of-day (SURVEY §1.3 — no native
    // Spark TIME type; Spark's own JDBC source does the same)
    val create = MySqlDdlParser.parse(
      "CREATE TABLE app.shifts (id BIGINT NOT NULL PRIMARY KEY, start_t TIME(3))").head
      .asInstanceOf[CreateTableEvent]
    assert(create.schema.struct("start_t").dataType == IntegerType)
    composer.createTables(Map(t -> create.schema))

    val nineThirty = (9 * 3600 + 30 * 60) * 1000 // 09:30:00.000
    composer.processBatch(t, ValuesSource.toEnvelope(spark, create.schema, Seq(
      DataChangeEvent.insert(t, Map("id" -> 1L, "start_t" -> nineThirty)))))
    assert(sink.rowsOf(t) == Seq(Seq(1L, nineThirty)))
  }

  test("dispatch rules with incompatible output shapes refuse at create time") {
    // the reference's testTransformMergingIncompatibleRules: multiple
    // rules matching one table must project the SAME shape — schemas that
    // cannot strictly merge fail the pipeline instead of silently
    // unioning mismatched columns
    import org.apache.spark.sql.types._
    val t = TableId.parse("db.t")
    val s = TableSchema(StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType),
      StructField("age", IntegerType))), primaryKeys = Seq("id"))
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty),
      transforms = Seq(
        TransformRule("db.t", projection = Some("id, name"), filter = Some("age < 20")),
        TransformRule("db.t", projection = Some("id, age"), filter = Some("age >= 20"))))
    val composer = new PipelineComposer(pdef, new MemoryDatabase)
    val e = intercept[IllegalArgumentException](composer.createTables(Map(t -> s)))
    // the reference's strictlyMergeSchemas phrasing (SchemaMergingUtils:373)
    assert(e.getMessage.contains("more than one column name views"), e.getMessage)
    assert(e.getMessage.contains("[id, name]") && e.getMessage.contains("[id, age]"),
      e.getMessage)
  }

  test("processBatch over many micro-batches leaves no cached plans behind") {
    val t = TableId.parse("db.leak")
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t -> ValuesSource.customersSchema))

    // shared test session: start from a clean cache so the assertion below is
    // about THIS test's batches (other suites may legitimately cache frames)
    spark.sharedState.cacheManager.clearCache()
    (1 to 12).foreach { i =>
      composer.processBatch(t, ValuesSource.toEnvelope(spark, ValuesSource.customersSchema,
        Seq(
          DataChangeEvent.insert(t, Map("col1" -> s"$i", "col2" -> "x")),
          DataChangeEvent.delete(t, Map("col1" -> s"${i - 1}", "col2" -> "x")))))
    }
    // the per-batch upsert aggregate is persisted only for the duration of the
    // write — a long-running stream must not accumulate cached entries
    assert(spark.sharedState.cacheManager.isEmpty,
      "cacheManager still holds entries after micro-batches completed")
    assert(sink.rowsOf(t).map(_.head.toString).sorted == Seq("12"))
  }

  test("schema evolution mid-stream under LENIENT with old-shape late rows") {
    val t = TableId.parse("db.t")
    val s0 = ValuesSource.customersSchema
    val pdef = PipelineDef(
      source = SourceDef("values", None, Map.empty),
      sink = SinkDef("values", None, Map.empty))
    val sink = new MemoryDatabase
    val composer = new PipelineComposer(pdef, sink)
    composer.createTables(Map(t -> s0))

    composer.processBatch(t, ValuesSource.toEnvelope(spark, s0, Seq(
      DataChangeEvent.insert(t, Map("col1" -> "1", "col2" -> "a")))))

    // batch boundary: add col3
    composer.processSchemaChange(
      AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition("col3", IntT()))))

    // next batch arrives in the NEW shape
    val s1 = TableSchema(
      org.apache.spark.sql.types.StructType(s0.struct.fields :+
        org.apache.spark.sql.types.StructField("col3",
          org.apache.spark.sql.types.IntegerType)),
      primaryKeys = Seq("col1"))
    composer.processBatch(t, ValuesSource.toEnvelope(spark, s1, Seq(
      DataChangeEvent.insert(t, Map("col1" -> "2", "col2" -> "b", "col3" -> 7)))))

    // late row still in OLD shape coerces (null col3)
    composer.processBatch(t, ValuesSource.toEnvelope(spark, s0, Seq(
      DataChangeEvent.insert(t, Map("col1" -> "3", "col2" -> "c")))))

    val rows = sink.rowsOf(t).map(_.mkString(",")).sorted
    assert(rows == Seq("1,a,null", "2,b,7", "3,c,null"))
  }
}
