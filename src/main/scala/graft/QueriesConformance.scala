package graft

import graft.core._
import graft.pipeline._
import graft.sinks.MemoryDatabase
import graft.sources.cdc.{ChangeSourceRegistry, ScriptedChangeSource}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Reference conformance corpus: the scripted event sets of the reference's
  * composer integration tests, re-expressed as oracle gates over THIS
  * pipeline. Each gate scripts the exact event sequence of one reference
  * ITCase (fixtures: `flink-cdc-pipeline-connector-values/.../ValuesDataSourceHelper.java:52-540`;
  * expectations: `flink-cdc-composer/src/test/.../FlinkPipelineComposerITCase.java`,
  * `FlinkPipelineComposerLenientITCase.java`) through
  * [[graft.pipeline.PipelineRunner]] and asserts the reference's expected
  * FINAL MATERIALIZED STATE — the strongest offline-runnable parity evidence:
  * same events in, same table out.
  *
  * Events flow through the RUNNING pipeline in order, exactly as the
  * reference's in-band event stream does: the script receives a `drain`
  * callback and calls it at each epoch boundary (before appending DDL and
  * after), so every data window is read under the schema it was written in
  * — the park/evolve/ack loop then applies each DDL at a batch boundary.
  * Fixtures that interleave two tables in one split run as two sources here
  * (each table's own order intact — final state is insensitive to
  * cross-table interleave because key spaces are disjoint and schema
  * evolution is per-table).
  */
object QueriesConformance {

  private val Str = StringType

  private def schemaOf(cols: (String, DataType)*)(pks: String*): TableSchema =
    TableSchema(
      StructType(cols.map { case (n, t) => StructField(n, t) }),
      primaryKeys = pks.toSeq)

  /** The SINGLE_SPLIT_SINGLE_TABLE event script (ValuesDataSourceHelper
    * .java:173-265): 3 inserts, add col3, rename {col2->newCol2,
    * col3->newCol3}, drop newCol2, delete key 1, update key 2.
    */
  private def scriptSingleTable(
      src: ScriptedChangeSource, t: TableId, drain: () => Unit): Unit = {
    def ins(vals: (String, Any)*) = src.append(DataChangeEvent.insert(t, vals.toMap))
    ins("col1" -> "1", "col2" -> "1")
    ins("col1" -> "2", "col2" -> "2")
    ins("col1" -> "3", "col2" -> "3")
    drain()
    src.appendDdl(AddColumnEvent(t,
      Seq(AddColumnEvent.ColumnWithPosition("col3", CdcTypes.StringT()))))
    src.appendDdl(RenameColumnEvent(t, Map("col2" -> "newCol2", "col3" -> "newCol3")))
    src.appendDdl(DropColumnEvent(t, Seq("newCol2")))
    drain()
    src.append(DataChangeEvent.delete(t, Map("col1" -> "1", "newCol3" -> "1")))
    src.append(DataChangeEvent.update(t,
      Map("col1" -> "2", "newCol3" -> ""),
      Map("col1" -> "2", "newCol3" -> "x")))
  }

  /** Run a scripted conformance case: start the pipeline on EMPTY sources
    * (tables register with their INITIAL schemas, the snapshot pass drains
    * nothing, the log phase starts at offset 0), then run `script`, which
    * appends the fixture's event sequence and calls the provided callback to
    * drain every source — park/evolve/ack on DDL — at each epoch boundary.
    */
  private def runPipeline(
      s: SparkSession,
      sources: Seq[(String, ScriptedChangeSource)],
      behavior: String,
      extraYaml: String = "")(script: (() => Unit) => Unit): MemoryDatabase = {
    implicit val spark: SparkSession = s
    val ckpt = java.nio.file.Files.createTempDirectory("graft_conformance").toString
    val yaml =
      s"""source:
         |  type: cdc
         |  sourceId: ${sources.head._1}
         |  chunk.size: 10
         |sink:
         |  type: values
         |$extraYaml
         |pipeline:
         |  checkpoint.dir: $ckpt
         |  schema.change.behavior: $behavior
         |""".stripMargin
    val runner = new PipelineRunner(YamlPipelineParser.parse(yaml))
    def drainAll(): Unit = {
      runner.runHandlingDdl()
      sources.drop(1).foreach { case (id, _) => runner.drainTableHandlingDdl(id) }
    }
    drainAll() // empty snapshot pass: log phase starts at offset 0
    script(() => drainAll())
    drainAll()
    runner.sink.asInstanceOf[MemoryDatabase]
  }

  private def registered[A](sources: (String, ScriptedChangeSource)*)(
      body: => A): A =
    try {
      sources.foreach { case (id, src) => ChangeSourceRegistry.register(id, src) }
      body
    } finally sources.foreach { case (id, _) => ChangeSourceRegistry.remove(id) }

  private def freshId(tag: String) = s"conformance-$tag-${java.util.UUID.randomUUID()}"

  /** MemoryDatabase rows -> DataFrame with explicit schema (values arrive
    * with the sink table's evolved types). */
  private def stateDf(
      s: SparkSession, db: MemoryDatabase, t: TableId): DataFrame = {
    val schema = db.schemaOf(t).getOrElse(
      throw new IllegalStateException(s"sink table $t missing"))
    val rows = db.rowsOf(t).map(Row.fromSeq)
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(schema.struct.fields.map(_.copy(nullable = true))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FlinkPipelineComposerITCase.testSingleSplitSingleTable:129-184 (EVOLVE):
    // final table1 = (col1, newCol3): ("2","x"), ("3",null)
    "c_conformance_single_table" -> ((s, _) => {
      val t = TableId.parse("default_schema.table1")
      val src = new ScriptedChangeSource(t, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val id = freshId("single")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE") { drain =>
          scriptSingleTable(src, t, drain)
        }
        require(db.schemaOf(t).exists(_.columnNames == Seq("col1", "newCol3")),
          s"evolved shape, got ${db.schemaOf(t).map(_.columnNames)}")
        stateDf(s, db, t).orderBy("col1")
      }
    }),

    // FlinkPipelineComposerLenientITCase.testSingleSplitSingleTable:119-172
    // (default LENIENT): rename -> additive newCol2+newCol3, drop swallowed;
    // full-row upserts null the columns the post-rename images no longer
    // carry. Final: (2,null,null,null,"x"), (3,"3",null,null,null)
    "c_conformance_lenient_single_table" -> ((s, _) => {
      val t = TableId.parse("default_schema.table1")
      val src = new ScriptedChangeSource(t, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val id = freshId("lenient")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "LENIENT") { drain =>
          scriptSingleTable(src, t, drain)
        }
        require(db.schemaOf(t).exists(
          _.columnNames == Seq("col1", "col2", "col3", "newCol2", "newCol3")),
          s"lenient additive shape, got ${db.schemaOf(t).map(_.columnNames)}")
        stateDf(s, db, t).orderBy("col1")
      }
    }),

    // FlinkPipelineComposerITCase.testSingleSplitMultipleTables:188-253
    // (EVOLVE): table1 evolves (add/rename/drop), table2 untouched.
    // Emitted as (tbl, col1, v): v = newCol3 for table1, col2 for table2.
    "c_conformance_multi_tables" -> ((s, _) => {
      val t1 = TableId.parse("default_schema.table1")
      val t2 = TableId.parse("default_schema.table2")
      val src1 = new ScriptedChangeSource(t1, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val src2 = new ScriptedChangeSource(t2, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val (id1, id2) = (freshId("multi1"), freshId("multi2"))
      registered(id1 -> src1, id2 -> src2) {
        val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE") { drain =>
          Seq("1", "2", "3").foreach(k =>
            src2.append(DataChangeEvent.insert(t2, Map("col1" -> k, "col2" -> k))))
          scriptSingleTable(src1, t1, drain)
        }
        import s.implicits._
        val a = stateDf(s, db, t1).collect().toSeq
          .map(r => ("table1", r.getString(0), r.getString(1)))
        val b = stateDf(s, db, t2).collect().toSeq
          .map(r => ("table2", r.getString(0), r.getString(1)))
        (a ++ b).toDF("tbl", "col1", "v").orderBy("tbl", "col1")
      }
    }),

    // FlinkPipelineComposerITCase.testMultiSplitsSingleTable:257-297: splits
    // are parallel slices of one table; the final state is split-interleave
    // insensitive, so the four splits run as one ordered log here. Final:
    // (1,1,x), (3,3,x), (5,5,null) — 2,4,6 deleted.
    "c_conformance_multi_splits" -> ((s, _) => {
      val t = TableId.parse("default_schema.table1")
      val src = new ScriptedChangeSource(t, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val id = freshId("splits")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE") { drain =>
          Seq("1", "2", "3", "4", "5", "6").foreach(k =>
            src.append(DataChangeEvent.insert(t, Map("col1" -> k, "col2" -> k))))
          Seq("2", "4", "6").foreach(k =>
            src.append(DataChangeEvent.delete(t, Map("col1" -> k, "col2" -> k))))
          drain()
          src.appendDdl(AddColumnEvent(t,
            Seq(AddColumnEvent.ColumnWithPosition("col3", CdcTypes.StringT()))))
          drain()
          Seq("1", "3").foreach(k =>
            src.append(DataChangeEvent.update(t,
              Map("col1" -> k, "col2" -> k, "col3" -> ""),
              Map("col1" -> k, "col2" -> k, "col3" -> "x"))))
        }
        stateDf(s, db, t).orderBy("col1")
      }
    }),

    // FlinkPipelineComposerITCase.testOneToOneRouting:499-572 (EVOLVE):
    // table1->routed1 (evolves), table2->routed2 (static).
    "c_conformance_route_one_to_one" -> ((s, _) => {
      val t1 = TableId.parse("default_schema.table1")
      val t2 = TableId.parse("default_schema.table2")
      val src1 = new ScriptedChangeSource(t1, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val src2 = new ScriptedChangeSource(t2, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val (id1, id2) = (freshId("route1"), freshId("route2"))
      registered(id1 -> src1, id2 -> src2) {
        val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE",
          extraYaml =
            """route:
              |  - source-table: default_schema.table1
              |    sink-table: default_schema.routed1
              |  - source-table: default_schema.table2
              |    sink-table: default_schema.routed2""".stripMargin) { drain =>
          Seq("1", "2", "3").foreach(k =>
            src2.append(DataChangeEvent.insert(t2, Map("col1" -> k, "col2" -> k))))
          scriptSingleTable(src1, t1, drain)
        }
        import s.implicits._
        val a = stateDf(s, db, TableId.parse("default_schema.routed1")).collect().toSeq
          .map(r => ("routed1", r.getString(0), r.getString(1)))
        val b = stateDf(s, db, TableId.parse("default_schema.routed2")).collect().toSeq
          .map(r => ("routed2", r.getString(0), r.getString(1)))
        (a ++ b).toDF("tbl", "col1", "v").orderBy("tbl", "col1")
      }
    }),

    // FlinkPipelineComposerITCase.testRouteWithReplaceSymbol:1258-1315
    // (EVOLVE): pattern route `table[0-9]` -> `replaced.<>` keeps per-table
    // identity under a new namespace.
    "c_conformance_route_replace" -> ((s, _) => {
      val t1 = TableId.parse("default_schema.table1")
      val t2 = TableId.parse("default_schema.table2")
      val src1 = new ScriptedChangeSource(t1, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val src2 = new ScriptedChangeSource(t2, schemaOf("col1" -> Str, "col2" -> Str)("col1"), Seq.empty)
      val (id1, id2) = (freshId("repl1"), freshId("repl2"))
      registered(id1 -> src1, id2 -> src2) {
        val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE",
          extraYaml =
            """route:
              |  - source-table: default_schema.table\.*
              |    sink-table: replaced_schema.<>
              |    replace-symbol: <>""".stripMargin) { drain =>
          Seq("1", "2", "3").foreach(k =>
            src2.append(DataChangeEvent.insert(t2, Map("col1" -> k, "col2" -> k))))
          scriptSingleTable(src1, t1, drain)
        }
        import s.implicits._
        val a = stateDf(s, db, TableId.parse("replaced_schema.table1")).collect().toSeq
          .map(r => ("table1", r.getString(0), r.getString(1)))
        val b = stateDf(s, db, TableId.parse("replaced_schema.table2")).collect().toSeq
          .map(r => ("table2", r.getString(0), r.getString(1)))
        (a ++ b).toDF("tbl", "col1", "v").orderBy("tbl", "col1")
      }
    }),

    // FlinkPipelineComposerITCase.testMergingWithRoute:653-847 (EVOLVE):
    // mytable1 (id INT, name, age INT) + mytable2 (id BIGINT, name
    // VARCHAR(255), age TINYINT, description) route-merge into `merged`;
    // id widens INT->BIGINT, description appends, the mytable1 rename
    // name->last_name surfaces as ADD last_name (merged sinks evolve by
    // least-common-schema DIFFERENCE, `SchemaCoordinator.java:297-322`),
    // mytable2's ADD gender appends. Final merged rows reproduce
    // ITCase :819-846.
    "c_conformance_merge_route" -> ((s, _) => {
      val t1 = TableId.parse("default_schema.mytable1")
      val t2 = TableId.parse("default_schema.mytable2")
      val src1 = new ScriptedChangeSource(t1,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val src2 = new ScriptedChangeSource(t2,
        schemaOf("id" -> LongType, "name" -> Str, "age" -> ByteType, "description" -> Str)("id"),
        Seq.empty)
      val (id1, id2) = (freshId("merge1"), freshId("merge2"))
      registered(id1 -> src1, id2 -> src2) {
        val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE",
          extraYaml =
            """route:
              |  - source-table: default_schema.mytable\.*
              |    sink-table: default_schema.merged""".stripMargin) { drain =>
          src1.append(DataChangeEvent.insert(t1, Map("id" -> 1, "name" -> "Alice", "age" -> 18)))
          src1.append(DataChangeEvent.insert(t1, Map("id" -> 2, "name" -> "Bob", "age" -> 20)))
          src1.append(DataChangeEvent.update(t1,
            Map("id" -> 2, "name" -> "Bob", "age" -> 20),
            Map("id" -> 2, "name" -> "Bob", "age" -> 30)))
          src2.append(DataChangeEvent.insert(t2,
            Map("id" -> 3L, "name" -> "Charlie", "age" -> 15.toByte, "description" -> "student")))
          src2.append(DataChangeEvent.insert(t2,
            Map("id" -> 4L, "name" -> "Donald", "age" -> 25.toByte, "description" -> "student")))
          src2.append(DataChangeEvent.delete(t2,
            Map("id" -> 4L, "name" -> "Donald", "age" -> 25.toByte, "description" -> "student")))
          drain()
          src1.appendDdl(RenameColumnEvent(t1, Map("name" -> "last_name")))
          src2.appendDdl(AddColumnEvent(t2,
            Seq(AddColumnEvent.ColumnWithPosition("gender", CdcTypes.StringT()))))
          drain()
          src1.append(DataChangeEvent.insert(t1,
            Map("id" -> 5, "last_name" -> "Eliza", "age" -> 24)))
          src2.append(DataChangeEvent.insert(t2,
            Map("id" -> 6L, "name" -> "Frank", "age" -> 30.toByte,
              "description" -> "student", "gender" -> "male")))
        }
        val merged = TableId.parse("default_schema.merged")
        require(db.schemaOf(merged).exists(
          _.columnNames == Seq("id", "name", "age", "description", "last_name", "gender")),
          s"merged shape per ITCase:819-830, got ${db.schemaOf(merged).map(_.columnNames)}")
        stateDf(s, db, merged).orderBy("id")
      }
    }),

    // FlinkPipelineTransformITCase.testVanillaTransformWithSchemaEvolution
    // :1336-1419 (EVOLVE, generateSchemaEvolutionEvents :3118-3245): five
    // stages — initial, ADD (rank FIRST + gender LAST), ALTER TYPE
    // (gender->INT, name->VARCHAR(17), age->DOUBLE), RENAME
    // (gender->biological_sex, age->toshi), DROP (both) — each with its own
    // insert/update/delete traffic. Final shape (rank, id, name).
    "c_conformance_schema_evolution" -> ((s, _) => {
      val t = TableId.parse("default_schema.mytable1")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("evo")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE") { drain =>
          scriptSchemaEvolution(src, t, drain)
        }
        require(db.schemaOf(t).exists(_.columnNames == Seq("rank", "id", "name")),
          s"final shape per ITCase, got ${db.schemaOf(t).map(_.columnNames)}")
        stateDf(s, db, t).orderBy("id")
      }
    }),

    // FlinkPipelineTransformITCase.testWildcardTransformWithSchemaEvolution
    // :1422-1514: the SAME five-stage event set through a `*` transform —
    // every schema event must project through the wildcard rule unchanged
    // and produce the identical final state.
    "c_conformance_wildcard_evolution" -> ((s, _) => {
      val t = TableId.parse("default_schema.mytable1")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("wild")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: default_schema.mytable1
              |    projection: "*"""".stripMargin) { drain =>
          scriptSchemaEvolution(src, t, drain)
        }
        require(db.schemaOf(t).exists(_.columnNames == Seq("rank", "id", "name")),
          s"final shape per ITCase, got ${db.schemaOf(t).map(_.columnNames)}")
        stateDf(s, db, t).orderBy("id")
      }
    }),

    // FlinkPipelineTransformITCase.testCalculatedColumns:145-168: computed
    // columns `*, id || name AS uid, age * 2 AS double_age` appended to two
    // differently-shaped tables (getTestEvents :1274).
    "c_conformance_calculated_columns" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "calc",
        """transform:
          |  - source-table: default_schema.mytable\.*
          |    projection: "*, id || name AS uid, age * 2 AS double_age"""".stripMargin)
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getString(1), r.getInt(2),
          null: String, r.getString(3), r.getInt(4)))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getString(1), r.getByte(2).toInt,
          r.getString(3), r.getString(4), r.getInt(5)))
      (a ++ b).toDF("tbl", "id", "name", "age", "description", "uid", "double_age")
        .orderBy("id")
    }),

    // FlinkPipelineTransformITCase.testFilteringRules:222-247: filter-only
    // rule `CHAR_LENGTH(name) > 3` — drops Bob's insert AND update (so the
    // row never lands), keeps Carol, lets Derrida's delete through.
    "c_conformance_filter_rules" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "filter",
        """transform:
          |  - source-table: default_schema.mytable\.*
          |    filter: "CHAR_LENGTH(name) > 3"""".stripMargin)
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getString(1), r.getInt(2), null: String))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getString(1), r.getByte(2).toInt, r.getString(3)))
      (a ++ b).toDF("tbl", "id", "name", "age", "description").orderBy("id")
    }),

    // FlinkPipelineTransformITCase.testMultipleDispatchTransform:250-281:
    // TWO rules match every table; each record goes to the FIRST rule
    // whose filter accepts it (age<20 -> YOUNG, else OLD).
    "c_conformance_multi_dispatch" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "dispatch",
        """transform:
          |  - source-table: default_schema.mytable\.*
          |    projection: "*, 'YOUNG' AS category"
          |    filter: "age < 20"
          |  - source-table: default_schema.mytable\.*
          |    projection: "*, 'OLD' AS category"
          |    filter: "age >= 20"""".stripMargin)
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getString(1), r.getInt(2),
          null: String, r.getString(3)))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getString(1), r.getByte(2).toInt,
          r.getString(3), r.getString(4)))
      (a ++ b).toDF("tbl", "id", "name", "age", "description", "category")
        .orderBy("id")
    }),

    // FlinkPipelineTransformITCase.testMultipleTransformWithDiffRefColumn
    // :285-316: dispatched rules whose projections REFERENCE DIFFERENT
    // columns for the same output (constant 'Juvenile' vs `name`).
    "c_conformance_dispatch_ref_cols" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "refcols",
        """transform:
          |  - source-table: default_schema.mytable\.*
          |    projection: "id, age, 'Juvenile' AS roleName"
          |    filter: "age < 18"
          |  - source-table: default_schema.mytable\.*
          |    projection: "id, age, name AS roleName"
          |    filter: "age >= 18"""".stripMargin)
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getInt(1), r.getString(2)))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getByte(1).toInt, r.getString(2)))
      (a ++ b).toDF("tbl", "id", "age", "roleName").orderBy("id")
    }),

    // FlinkPipelineTransformITCase.testMetadataColumnWithWildcard:620-647:
    // `*, __namespace_name__, __schema_name__, __table_name__` appends the
    // metadata columns per 3-part table id.
    "c_conformance_metadata_wildcard" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "metaw",
        """transform:
          |  - source-table: default_namespace.default_schema.mytable\.*
          |    projection: "*, __namespace_name__, __schema_name__, __table_name__"""".stripMargin,
        idPrefix = "default_namespace.default_schema")
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getString(1), r.getInt(2), null: String,
          r.getString(3), r.getString(4), r.getString(5)))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getString(1), r.getByte(2).toInt, r.getString(3),
          r.getString(4), r.getString(5), r.getString(6)))
      (a ++ b).toDF("tbl", "id", "name", "age", "description",
        "namespace_name", "schema_name", "table_name").orderBy("id")
    }),

    // FlinkPipelineTransformITCase.testUsingMetadataColumnLiteralWithWildcard
    // :650-675: a string LITERAL spelled like metadata identifiers must stay
    // a literal — the parser distinguishes identifiers from quoted strings.
    "c_conformance_metadata_literal" -> ((s, _) => {
      val (db, t1, t2) = runTwoTableTransform(s, "metal",
        """transform:
          |  - source-table: default_namespace.default_schema.mytable\.*
          |    projection: "*, '__namespace_name____schema_name____table_name__' AS string_literal"""".stripMargin,
        idPrefix = "default_namespace.default_schema")
      import s.implicits._
      val a = stateDf(s, db, t1).collect().toSeq.map(r =>
        ("mytable1", r.getInt(0).toLong, r.getString(1), r.getInt(2), null: String,
          r.getString(3)))
      val b = stateDf(s, db, t2).collect().toSeq.map(r =>
        ("mytable2", r.getLong(0), r.getString(1), r.getByte(2).toInt, r.getString(3),
          r.getString(4)))
      (a ++ b).toDF("tbl", "id", "name", "age", "description", "string_literal")
        .orderBy("id")
    }))

  /** generateSchemaEvolutionEvents (FlinkPipelineTransformITCase:3118-3245):
    * the five-stage add/alter/rename/drop script with per-stage traffic.
    */
  private def scriptSchemaEvolution(
      src: ScriptedChangeSource, t: TableId, drain: () => Unit): Unit = {
    def ins(vals: (String, Any)*) = src.append(DataChangeEvent.insert(t, vals.toMap))
    def upd(before: Map[String, Any], after: Map[String, Any]) =
      src.append(DataChangeEvent.update(t, before, after))
    def del(vals: (String, Any)*) = src.append(DataChangeEvent.delete(t, vals.toMap))

    // initial stage
    ins("id" -> 1, "name" -> "Alice", "age" -> 21)
    ins("id" -> 2, "name" -> "Barcarolle", "age" -> 22)
    ins("id" -> 3, "name" -> "Cecily", "age" -> 23)
    upd(Map("id" -> 3, "name" -> "Cecily", "age" -> 23),
      Map("id" -> 3, "name" -> "Colin", "age" -> 24))
    del("id" -> 2, "name" -> "Barcarolle", "age" -> 22)
    drain()
    // add column stage: rank FIRST, gender LAST
    src.appendDdl(AddColumnEvent(t, Seq(
      AddColumnEvent.ColumnWithPosition("rank", CdcTypes.StringT(), AddColumnEvent.First),
      AddColumnEvent.ColumnWithPosition("gender", CdcTypes.TinyIntT()))))
    drain()
    ins("rank" -> "1st", "id" -> 4, "name" -> "Derrida", "age" -> 24, "gender" -> 0.toByte)
    ins("rank" -> "2nd", "id" -> 5, "name" -> "Eve", "age" -> 25, "gender" -> 1.toByte)
    upd(Map("rank" -> "2nd", "id" -> 5, "name" -> "Eve", "age" -> 25, "gender" -> 1.toByte),
      Map("rank" -> "2nd", "id" -> 5, "name" -> "Eva", "age" -> 20, "gender" -> 2.toByte))
    ins("rank" -> "3rd", "id" -> 6, "name" -> "Fiona", "age" -> 26, "gender" -> 3.toByte)
    del("rank" -> "3rd", "id" -> 6, "name" -> "Fiona", "age" -> 26, "gender" -> 3.toByte)
    drain()
    // alter column type stage: gender TINYINT->INT, name ->VARCHAR(17), age INT->DOUBLE
    src.appendDdl(AlterColumnTypeEvent(t, Map(
      "gender" -> CdcTypes.IntT(), "name" -> CdcTypes.VarCharT(17),
      "age" -> CdcTypes.DoubleT())))
    drain()
    ins("rank" -> "4th", "id" -> 7, "name" -> "Gem", "age" -> 19.0, "gender" -> -1)
    ins("rank" -> "5th", "id" -> 8, "name" -> "Helen", "age" -> 18.0, "gender" -> -2)
    upd(Map("rank" -> "5th", "id" -> 8, "name" -> "Helen", "age" -> 18.0, "gender" -> -2),
      Map("rank" -> "5th", "id" -> 8, "name" -> "Harry", "age" -> 18.0, "gender" -> -3))
    ins("rank" -> "6th", "id" -> 9, "name" -> "IINA", "age" -> 17.0, "gender" -> 0)
    del("rank" -> "6th", "id" -> 9, "name" -> "IINA", "age" -> 17.0, "gender" -> 0)
    drain()
    // rename column stage
    src.appendDdl(RenameColumnEvent(t, Map("gender" -> "biological_sex", "age" -> "toshi")))
    drain()
    ins("rank" -> "7th", "id" -> 10, "name" -> "Julia", "toshi" -> 24.0, "biological_sex" -> 1)
    ins("rank" -> "8th", "id" -> 11, "name" -> "Kalle", "toshi" -> 23.0, "biological_sex" -> 0)
    upd(Map("rank" -> "8th", "id" -> 11, "name" -> "Kalle", "toshi" -> 23.0, "biological_sex" -> 0),
      Map("rank" -> "8th", "id" -> 11, "name" -> "Kella", "toshi" -> 18.0, "biological_sex" -> 0))
    ins("rank" -> "9th", "id" -> 12, "name" -> "Lynx", "toshi" -> 17.0, "biological_sex" -> 0)
    del("rank" -> "9th", "id" -> 12, "name" -> "Lynx", "toshi" -> 17.0, "biological_sex" -> 0)
    drain()
    // drop column stage
    src.appendDdl(DropColumnEvent(t, Seq("biological_sex", "toshi")))
    drain()
    ins("rank" -> "10th", "id" -> 13, "name" -> "Munroe")
    ins("rank" -> "11th", "id" -> 14, "name" -> "Neko")
    upd(Map("rank" -> "11th", "id" -> 14, "name" -> "Neko"),
      Map("rank" -> "11th", "id" -> 14, "name" -> "Nein"))
    ins("rank" -> "12th", "id" -> 15, "name" -> "Oops")
    del("rank" -> "12th", "id" -> 15, "name" -> "Oops")
  }

  /** getTestEvents (FlinkPipelineTransformITCase:1274-1333): the two-table
    * transform fixture — mytable1 (id INT, name, age INT): Alice, Bob,
    * Bob age 20->30; mytable2 (id BIGINT, name VARCHAR(255), age TINYINT,
    * description): Carol, Derrida inserted, Derrida deleted.
    */
  private def runTwoTableTransform(
      s: SparkSession, tag: String, transformYaml: String,
      idPrefix: String = "default_schema"): (MemoryDatabase, TableId, TableId) = {
    val t1 = TableId.parse(s"$idPrefix.mytable1")
    val t2 = TableId.parse(s"$idPrefix.mytable2")
    val src1 = new ScriptedChangeSource(t1,
      schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
    val src2 = new ScriptedChangeSource(t2,
      schemaOf("id" -> LongType, "name" -> Str, "age" -> ByteType, "description" -> Str)("id"),
      Seq.empty)
    val (id1, id2) = (freshId(s"$tag-1"), freshId(s"$tag-2"))
    registered(id1 -> src1, id2 -> src2) {
      val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE",
        extraYaml = transformYaml) { _ =>
        src1.append(DataChangeEvent.insert(t1, Map("id" -> 1, "name" -> "Alice", "age" -> 18)))
        src1.append(DataChangeEvent.insert(t1, Map("id" -> 2, "name" -> "Bob", "age" -> 20)))
        src1.append(DataChangeEvent.update(t1,
          Map("id" -> 2, "name" -> "Bob", "age" -> 20),
          Map("id" -> 2, "name" -> "Bob", "age" -> 30)))
        src2.append(DataChangeEvent.insert(t2,
          Map("id" -> 3L, "name" -> "Carol", "age" -> 15.toByte, "description" -> "student")))
        src2.append(DataChangeEvent.insert(t2,
          Map("id" -> 4L, "name" -> "Derrida", "age" -> 25.toByte, "description" -> "student")))
        src2.append(DataChangeEvent.delete(t2,
          Map("id" -> 4L, "name" -> "Derrida", "age" -> 25.toByte, "description" -> "student")))
      }
      (db, t1, t2)
    }
  }

  val oracles: Map[String, String] = Map(
    "c_conformance_single_table" ->
      """SELECT * FROM (VALUES ('2', 'x'), ('3', CAST(NULL AS VARCHAR)))
        |AS t(col1, newCol3) ORDER BY col1""".stripMargin,
    "c_conformance_lenient_single_table" ->
      """SELECT * FROM (VALUES
        |  ('2', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'x'),
        |  ('3', '3', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)))
        |AS t(col1, col2, col3, newCol2, newCol3) ORDER BY col1""".stripMargin,
    "c_conformance_multi_tables" ->
      """SELECT * FROM (VALUES
        |  ('table1', '2', 'x'), ('table1', '3', CAST(NULL AS VARCHAR)),
        |  ('table2', '1', '1'), ('table2', '2', '2'), ('table2', '3', '3'))
        |AS t(tbl, col1, v) ORDER BY tbl, col1""".stripMargin,
    "c_conformance_multi_splits" ->
      """SELECT * FROM (VALUES
        |  ('1', '1', 'x'), ('3', '3', 'x'), ('5', '5', CAST(NULL AS VARCHAR)))
        |AS t(col1, col2, col3) ORDER BY col1""".stripMargin,
    "c_conformance_route_one_to_one" ->
      """SELECT * FROM (VALUES
        |  ('routed1', '2', 'x'), ('routed1', '3', CAST(NULL AS VARCHAR)),
        |  ('routed2', '1', '1'), ('routed2', '2', '2'), ('routed2', '3', '3'))
        |AS t(tbl, col1, v) ORDER BY tbl, col1""".stripMargin,
    "c_conformance_route_replace" ->
      """SELECT * FROM (VALUES
        |  ('table1', '2', 'x'), ('table1', '3', CAST(NULL AS VARCHAR)),
        |  ('table2', '1', '1'), ('table2', '2', '2'), ('table2', '3', '3'))
        |AS t(tbl, col1, v) ORDER BY tbl, col1""".stripMargin,
    "c_conformance_merge_route" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  (2, 'Bob', 30, NULL, NULL, NULL),
        |  (3, 'Charlie', 15, 'student', NULL, NULL),
        |  (5, NULL, 24, NULL, 'Eliza', NULL),
        |  (6, 'Frank', 30, 'student', NULL, 'male'))
        |AS t(id, name, age, description, last_name, gender) ORDER BY id""".stripMargin,
    "c_conformance_schema_evolution" -> schemaEvolutionOracle,
    "c_conformance_wildcard_evolution" -> schemaEvolutionOracle,
    "c_conformance_calculated_columns" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR), '1Alice', 36),
        |  ('mytable1', 2, 'Bob', 30, NULL, '2Bob', 60),
        |  ('mytable2', 3, 'Carol', 15, 'student', '3Carol', 30))
        |AS t(tbl, id, name, age, description, uid, double_age) ORDER BY id""".stripMargin,
    "c_conformance_filter_rules" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR)),
        |  ('mytable2', 3, 'Carol', 15, 'student'))
        |AS t(tbl, id, name, age, description) ORDER BY id""".stripMargin,
    "c_conformance_multi_dispatch" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR), 'YOUNG'),
        |  ('mytable1', 2, 'Bob', 30, NULL, 'OLD'),
        |  ('mytable2', 3, 'Carol', 15, 'student', 'YOUNG'))
        |AS t(tbl, id, name, age, description, category) ORDER BY id""".stripMargin,
    "c_conformance_dispatch_ref_cols" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 18, 'Alice'),
        |  ('mytable1', 2, 30, 'Bob'),
        |  ('mytable2', 3, 15, 'Juvenile'))
        |AS t(tbl, id, age, roleName) ORDER BY id""".stripMargin,
    "c_conformance_metadata_wildcard" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR),
        |   'default_namespace', 'default_schema', 'mytable1'),
        |  ('mytable1', 2, 'Bob', 30, NULL, 'default_namespace', 'default_schema', 'mytable1'),
        |  ('mytable2', 3, 'Carol', 15, 'student', 'default_namespace', 'default_schema', 'mytable2'))
        |AS t(tbl, id, name, age, description, namespace_name, schema_name, table_name)
        |ORDER BY id""".stripMargin,
    "c_conformance_metadata_literal" ->
      """SELECT * FROM (VALUES
        |  ('mytable1', CAST(1 AS BIGINT), 'Alice', 18, CAST(NULL AS VARCHAR),
        |   '__namespace_name____schema_name____table_name__'),
        |  ('mytable1', 2, 'Bob', 30, NULL, '__namespace_name____schema_name____table_name__'),
        |  ('mytable2', 3, 'Carol', 15, 'student', '__namespace_name____schema_name____table_name__'))
        |AS t(tbl, id, name, age, description, string_literal) ORDER BY id""".stripMargin)

  /** Final state of generateSchemaEvolutionEvents under EVOLVE (identical for
    * the vanilla and wildcard-transform pipelines — ITCase asserts the same
    * event stream for both).
    */
  private def schemaEvolutionOracle: String =
    """SELECT * FROM (VALUES
      |  (CAST(NULL AS VARCHAR), 1, 'Alice'),
      |  (NULL, 3, 'Colin'),
      |  ('1st', 4, 'Derrida'),
      |  ('2nd', 5, 'Eva'),
      |  ('4th', 7, 'Gem'),
      |  ('5th', 8, 'Harry'),
      |  ('7th', 10, 'Julia'),
      |  ('8th', 11, 'Kella'),
      |  ('10th', 13, 'Munroe'),
      |  ('11th', 14, 'Nein'))
      |AS t("rank", id, name) ORDER BY id""".stripMargin
}
