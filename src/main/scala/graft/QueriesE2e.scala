package graft

import graft.core._
import graft.pipeline._
import graft.sinks.MemoryDatabase
import graft.sources.cdc.ScriptedChangeSource
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import QueriesConformance.{schemaOf, runPipeline, runPipelineR, registered,
  freshId, stateDf, requireEventSequence, requireDdlSequence}

/** The reference's YAML-driven pipeline e2e tree
  * (`flink-cdc-e2e-tests/flink-cdc-pipeline-e2e-tests/src/test/.../tests/`),
  * ported onto scripted sources through the same YAML submission surface the
  * e2e harness uses (`submitPipelineJob` → here [[PipelineRunner]] on parsed
  * YAML — the `graft.Cli` path's engine). The MySQL/Testcontainers halves are
  * environment-blocked (zero egress); each test's YAML pipeline + asserted
  * sink lines port directly: the `route_test.sql` / `schema_evolve.sql`
  * fixtures become scripted event sets, and the `validateResult` lines become
  * per-table event-sequence assertions.
  *
  * Two fidelity notes, applying throughout:
  *  - the reference's `validateResult` is PRESENCE-only (it waits for each
  *    line in the TaskManager stdout — `PipelineTestEnvironment.java:452-492`);
  *    these gates assert the stronger exact per-table sequences (graft's
  *    drain order is deterministic: sources drain in declaration order).
  *  - all e2e pipelines run under the dist default global config
  *    (`flink-cdc-dist/src/main/flink-cdc-bin/conf/flink-cdc.yaml`:
  *    `schema.change.behavior: EVOLVE`, parallelism 4), so unannotated YAMLs
  *    here run EVOLVE, not the code-default LENIENT.
  *  - VARCHAR(n) erases to `string` in the Spark data plane (SURVEY §1.3),
  *    but the declared width rides the field metadata (`CdcTypes.TypeKey`),
  *    so the merged-route diff is width-sensitive: the reference's
  *    `VARCHAR(17)∨VARCHAR(19) → STRING` widening
  *    (`SchemaMergingUtils.getLeastCommonType:471`) derives the
  *    `AlterColumnTypeEvent{VERSION=STRING}` that `RouteE2eITCase:313`
  *    asserts. One-to-one routes forward the raw event without diffing
  *    (`SchemaCoordinator.java:291`). Data values are unaffected either way
  *    (the render shows the Spark type, `string`).
  */
object QueriesE2e {

  private val Str = StringType

  // ---------------------------------------------------------------------
  // RouteE2eITCase fixtures (ddl/route_test.sql + the shared change scripts)
  // ---------------------------------------------------------------------

  private val alphaRows = Seq(1008 -> "8", 1009 -> "8.1", 1010 -> "10", 1011 -> "11")
  private val betaRows = Seq(2011 -> "11", 2012 -> "12", 2013 -> "13", 2014 -> "14")
  private val gammaRows = Seq(3015 -> "Amber", 3016 -> "Black", 3017 -> "Cyan", 3018 -> "Denim")
  private val deltaRows = Seq(4019 -> "Yosemite", 4020 -> "El Capitan", 4021 -> "Sierra",
    4022 -> "High Sierra", 4023 -> "Mojave", 4024 -> "Catalina")
  private val routeTables = Seq(
    ("TABLEALPHA", alphaRows), ("TABLEBETA", betaRows),
    ("TABLEGAMMA", gammaRows), ("TABLEDELTA", deltaRows))

  private def insLine(id: Int, v: String) =
    s"before=[], after=[$id, $v], op=INSERT, meta=()"
  private def insLines(rows: Seq[(Int, String)]): Seq[String] =
    rows.map { case (id, v) => insLine(id, v) }

  private final case class RouteFixture(
      ids: Seq[String],
      srcs: Map[String, ScriptedChangeSource],
      tids: Map[String, TableId])

  private def routeFixture(tag: String, snapshot: Boolean): RouteFixture = {
    val entries = routeTables.map { case (name, rows) =>
      val t = TableId.parse(s"route_db.$name")
      val initial =
        if (snapshot) rows.map { case (id, v) => Map[String, Any]("ID" -> id, "VERSION" -> v) }
        else Seq.empty
      // `ID INT NOT NULL, VERSION VARCHAR(17)` (ddl/route_test.sql) — the
      // VARCHAR width rides the field metadata (CdcTypes.TypeKey) so the
      // merged-route diff is width-sensitive like the reference's
      val src = new ScriptedChangeSource(
        t,
        TableSchema(
          StructType(Seq(
            CdcTypes.toSparkField("ID", CdcTypes.IntT(nullable = false)),
            CdcTypes.toSparkField("VERSION", CdcTypes.VarCharT(17)))),
          primaryKeys = Seq("ID")),
        initial)
      (name, freshId(s"$tag-${name.toLowerCase}"), t, src)
    }
    RouteFixture(
      entries.map(_._2),
      entries.map(e => e._1 -> e._4).toMap,
      entries.map(e => e._1 -> e._3).toMap)
  }

  /** route_test.sql INSERTs as the stream's snapshot-stage traffic. */
  private def scriptRouteSnapshot(f: RouteFixture): Unit =
    routeTables.foreach { case (name, rows) =>
      val src = f.srcs(name)
      rows.foreach { case (id, v) =>
        src.append(DataChangeEvent.insert(f.tids(name), Map("ID" -> id, "VERSION" -> v)))
      }
    }

  /** generateIncrementalChanges (RouteE2eITCase.java:66-85). */
  private def scriptRouteIncremental(f: RouteFixture): Unit = {
    f.srcs("TABLEALPHA").append(DataChangeEvent.insert(
      f.tids("TABLEALPHA"), Map("ID" -> 3007, "VERSION" -> "7")))
    f.srcs("TABLEBETA").append(DataChangeEvent.update(f.tids("TABLEBETA"),
      Map("ID" -> 2014, "VERSION" -> "14"), Map("ID" -> 2014, "VERSION" -> "2014")))
    f.srcs("TABLEGAMMA").append(DataChangeEvent.insert(
      f.tids("TABLEGAMMA"), Map("ID" -> 3019, "VERSION" -> "Emerald")))
    f.srcs("TABLEDELTA").append(DataChangeEvent.delete(
      f.tids("TABLEDELTA"), Map("ID" -> 4024, "VERSION" -> "Catalina")))
  }

  /** generateSchemaChanges (RouteE2eITCase.java:88-115): ALPHA adds NAME,
    * BETA renames VERSION→VERSION_EX, GAMMA's `CHANGE COLUMN` arrives as
    * AlterColumnType(VARCHAR(19)) + Rename (the MySQL source's two-event
    * decomposition the ITCase asserts), DELTA drops VERSION.
    */
  private def scriptRouteSchemaChanges(f: RouteFixture): Unit = {
    f.srcs("TABLEALPHA").appendDdl(AddColumnEvent(f.tids("TABLEALPHA"),
      Seq(AddColumnEvent.ColumnWithPosition("NAME", CdcTypes.VarCharT(17)))))
    f.srcs("TABLEALPHA").append(DataChangeEvent.insert(f.tids("TABLEALPHA"),
      Map("ID" -> 10001, "VERSION" -> "12", "NAME" -> "Derrida")))

    f.srcs("TABLEBETA").appendDdl(RenameColumnEvent(
      f.tids("TABLEBETA"), Map("VERSION" -> "VERSION_EX")))
    f.srcs("TABLEBETA").append(DataChangeEvent.insert(f.tids("TABLEBETA"),
      Map("ID" -> 10002, "VERSION_EX" -> "15")))

    f.srcs("TABLEGAMMA").appendDdl(AlterColumnTypeEvent(
      f.tids("TABLEGAMMA"), Map("VERSION" -> CdcTypes.VarCharT(19))))
    f.srcs("TABLEGAMMA").appendDdl(RenameColumnEvent(
      f.tids("TABLEGAMMA"), Map("VERSION" -> "VERSION_EX")))
    f.srcs("TABLEGAMMA").append(DataChangeEvent.insert(f.tids("TABLEGAMMA"),
      Map("ID" -> 10003, "VERSION_EX" -> "Fluorite")))

    f.srcs("TABLEDELTA").appendDdl(DropColumnEvent(f.tids("TABLEDELTA"), Seq("VERSION")))
    f.srcs("TABLEDELTA").append(DataChangeEvent.insert(f.tids("TABLEDELTA"),
      Map("ID" -> 10004)))
  }

  /** Final sink state over several (possibly differently-shaped) tables as a
    * uniform (tbl, id, vals) frame — non-key columns joined with `|`, nulls
    * rendered `null` (the e2e tests' final-state surface, minus stdout).
    */
  private def unionState(s: SparkSession, db: MemoryDatabase, tables: Seq[TableId]): DataFrame = {
    import s.implicits._
    tables.flatMap { t =>
      stateDf(s, db, t).collect().toSeq.map { r =>
        val vals = (1 until r.length).map(i =>
          if (r.isNullAt(i)) "null" else String.valueOf(r.get(i))).mkString("|")
        (t.tableName, r.getInt(0), vals)
      }
    }.toDF("tbl", "id", "vals").orderBy("tbl", "id")
  }

  /** Run the three-stage route script (snapshot traffic, incremental,
    * schema changes) through a parsed-YAML pipeline under EVOLVE — the
    * shared body of every streaming RouteE2e gate.
    */
  private def runRoutePipeline(s: SparkSession, tag: String, extraYaml: String)(
      assertAndState: (MemoryDatabase, RouteFixture) => DataFrame): DataFrame = {
    val f = routeFixture(tag, snapshot = false)
    registered(f.ids.zip(routeTables.map(t => f.srcs(t._1))): _*) {
      val db = runPipeline(s, f.ids.zip(routeTables.map(t => f.srcs(t._1))), "EVOLVE",
        extraYaml = extraYaml) { drain =>
        scriptRouteSnapshot(f)
        drain()
        scriptRouteIncremental(f)
        drain()
        scriptRouteSchemaChanges(f)
      }
      assertAndState(db, f)
    }
  }

  /** Run the snapshot-only BATCH twin (scan.startup.mode: snapshot +
    * execution.runtime-mode: BATCH in the reference YAML).
    */
  private def runRouteBatch(s: SparkSession, tag: String, extraYaml: String)(
      assertAndState: (MemoryDatabase, RouteFixture) => DataFrame): DataFrame = {
    implicit val spark: SparkSession = s
    val f = routeFixture(tag, snapshot = true)
    registered(f.ids.zip(routeTables.map(t => f.srcs(t._1))): _*) {
      val runner = new PipelineRunner(YamlPipelineParser.parse(
        s"""source:
           |  type: cdc
           |  sourceId: ${f.ids.head}
           |sink:
           |  type: values
           |  record.events: true
           |$extraYaml
           |pipeline:
           |  execution.runtime-mode: BATCH
           |""".stripMargin))
      runner.runBatch(extraSourceIds = f.ids.drop(1))
      assertAndState(runner.sink.asInstanceOf[MemoryDatabase], f)
    }
  }

  // expected per-table sequences for the UNROUTED (or identically-renamed)
  // shape — shared by the default-route and replace-symbol gates
  private def alphaSeq = Seq("create:ID,VERSION") ++ insLines(alphaRows) ++ Seq(
    insLine(3007, "7"),
    "add:NAME",
    "before=[], after=[10001, 12, Derrida], op=INSERT, meta=()")
  private def betaSeq = Seq("create:ID,VERSION") ++ insLines(betaRows) ++ Seq(
    "before=[2014, 14], after=[2014, 2014], op=UPDATE, meta=()",
    "rename:VERSION->VERSION_EX",
    "before=[], after=[10002, 15], op=INSERT, meta=()")
  private def gammaSeq = Seq("create:ID,VERSION") ++ insLines(gammaRows) ++ Seq(
    insLine(3019, "Emerald"),
    // the reference asserts AlterColumnTypeEvent{VERSION=VARCHAR(19)}; at the
    // string type cap the one-to-one route forwards it as a (no-op) alter
    "alter:VERSION->string",
    "rename:VERSION->VERSION_EX",
    "before=[], after=[10003, Fluorite], op=INSERT, meta=()")
  private def deltaSeq = Seq("create:ID,VERSION") ++ insLines(deltaRows) ++ Seq(
    "before=[4024, Catalina], after=[], op=DELETE, meta=()",
    "drop:VERSION",
    "before=[], after=[10004], op=INSERT, meta=()")

  // final per-table states as (tbl, id, vals) rows — shared by the oracles
  private def alphaState(tbl: String) = Seq(
    (tbl, 1008, "8|null"), (tbl, 1009, "8.1|null"), (tbl, 1010, "10|null"),
    (tbl, 1011, "11|null"), (tbl, 3007, "7|null"), (tbl, 10001, "12|Derrida"))
  private def betaState(tbl: String) = Seq(
    (tbl, 2011, "11"), (tbl, 2012, "12"), (tbl, 2013, "13"),
    (tbl, 2014, "2014"), (tbl, 10002, "15"))
  private def gammaState(tbl: String) = Seq(
    (tbl, 3015, "Amber"), (tbl, 3016, "Black"), (tbl, 3017, "Cyan"),
    (tbl, 3018, "Denim"), (tbl, 3019, "Emerald"), (tbl, 10003, "Fluorite"))
  private def deltaState(tbl: String) = Seq(
    (tbl, 4019, ""), (tbl, 4020, ""), (tbl, 4021, ""),
    (tbl, 4022, ""), (tbl, 4023, ""), (tbl, 10004, ""))

  private def valuesSql(rows: Seq[(String, Int, String)]): String =
    rows.map { case (t, id, v) => s"('$t', $id, '${v.replace("'", "''")}')" }
      .mkString("SELECT * FROM (VALUES\n  ", ",\n  ", ")\nAS t(tbl, id, vals) ORDER BY tbl, id")

  // lazy: the parts are declared below (object-init order would read null)
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    routeQueries ++ evolvingTransformQueries ++ transformE2eQueries

  private val routeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RouteE2eITCase.testDefaultRoute:117-187: no route block — every table
    // flows under its own id; the three change stages land verbatim.
    "c_e2e_route_default" -> ((s, _) => {
      runRoutePipeline(s, "rtdef", "") { (db, f) =>
        requireEventSequence(db, f.tids("TABLEALPHA"), alphaSeq)
        requireEventSequence(db, f.tids("TABLEBETA"), betaSeq)
        requireEventSequence(db, f.tids("TABLEGAMMA"), gammaSeq)
        requireEventSequence(db, f.tids("TABLEDELTA"), deltaSeq)
        unionState(s, db, routeTables.map(t => f.tids(t._1)))
      }
    }),

    // RouteE2eITCase.testDefaultRouteInBatchMode:189-244 (snapshot + BATCH):
    // creates + the 18 snapshot rows only.
    "c_e2e_route_default_batch" -> ((s, _) => {
      runRouteBatch(s, "rtdefb", "") { (db, f) =>
        routeTables.foreach { case (name, rows) =>
          requireEventSequence(db, f.tids(name),
            Seq("create:ID,VERSION") ++ insLines(rows))
        }
        unionState(s, db, routeTables.map(t => f.tids(t._1)))
      }
    }),

    // RouteE2eITCase.testMergeTableRoute:246-317: all four tables merge into
    // route_db.ALL; ALPHA's add appends AFTER VERSION, BETA's rename surfaces
    // as ADD VERSION_EX; GAMMA's width alter derives the reference's
    // `AlterColumnTypeEvent{VERSION=STRING}` (:313 — VARCHAR(17)∨VARCHAR(19)
    // → STRING, width-aware via CdcTypes.TypeKey metadata), and GAMMA's
    // rename then widens VERSION_EX the same way (VARCHAR(19) arriving at a
    // VARCHAR(17) merged column — the reference's presence-only
    // validateResult doesn't list this second derived alter, but its
    // SchemaDerivator produces it); DELTA's drop derives nothing.
    "c_e2e_route_merge" -> ((s, _) => {
      runRoutePipeline(s, "rtmerge",
        """route:
          |  - source-table: route_db.\.*
          |    sink-table: route_db.ALL""".stripMargin) { (db, f) =>
        val all = TableId.parse("route_db.ALL")
        requireEventSequence(db, all,
          Seq("create:ID,VERSION") ++
            routeTables.flatMap(t => insLines(t._2)) ++ Seq(
            insLine(3007, "7"),
            "before=[2014, 14], after=[2014, 2014], op=UPDATE, meta=()",
            insLine(3019, "Emerald"),
            "before=[4024, Catalina], after=[], op=DELETE, meta=()",
            "add:NAME AFTER VERSION",
            "before=[], after=[10001, 12, Derrida], op=INSERT, meta=()",
            "add:VERSION_EX AFTER NAME",
            "before=[], after=[10002, null, null, 15], op=INSERT, meta=()",
            "alter:VERSION->string",
            "alter:VERSION_EX->string",
            "before=[], after=[10003, null, null, Fluorite], op=INSERT, meta=()",
            "before=[], after=[10004, null, null, null], op=INSERT, meta=()"))
        require(db.schemaOf(all).exists(
          _.columnNames == Seq("ID", "VERSION", "NAME", "VERSION_EX")),
          s"merged shape per ITCase:310-316, got ${db.schemaOf(all).map(_.columnNames)}")
        unionState(s, db, Seq(all))
      }
    }),

    // RouteE2eITCase.testMergeTableRouteInBatchMode:319-373.
    "c_e2e_route_merge_batch" -> ((s, _) => {
      runRouteBatch(s, "rtmergeb",
        """route:
          |  - source-table: route_db.\.*
          |    sink-table: route_db.ALL""".stripMargin) { (db, f) =>
        val all = TableId.parse("route_db.ALL")
        requireEventSequence(db, all,
          Seq("create:ID,VERSION") ++ routeTables.flatMap(t => insLines(t._2)))
        unionState(s, db, Seq(all))
      }
    }),

    // RouteE2eITCase.testPartialRoute:375-449: (TABLEALPHA|TABLEBETA) merge
    // into NEW_route_db.ALPHABET; GAMMA and DELTA flow default.
    "c_e2e_route_partial" -> ((s, _) => {
      runRoutePipeline(s, "rtpart",
        """route:
          |  - source-table: route_db.(TABLEALPHA|TABLEBETA)
          |    sink-table: NEW_route_db.ALPHABET""".stripMargin) { (db, f) =>
        val ab = TableId.parse("NEW_route_db.ALPHABET")
        requireEventSequence(db, ab,
          Seq("create:ID,VERSION") ++ insLines(alphaRows) ++ insLines(betaRows) ++ Seq(
            insLine(3007, "7"),
            "before=[2014, 14], after=[2014, 2014], op=UPDATE, meta=()",
            "add:NAME AFTER VERSION",
            "before=[], after=[10001, 12, Derrida], op=INSERT, meta=()",
            "add:VERSION_EX AFTER NAME",
            "before=[], after=[10002, null, null, 15], op=INSERT, meta=()"))
        requireEventSequence(db, f.tids("TABLEGAMMA"), gammaSeq)
        requireEventSequence(db, f.tids("TABLEDELTA"), deltaSeq)
        unionState(s, db, Seq(ab, f.tids("TABLEGAMMA"), f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testPartialRouteInBatchMode:451-508.
    "c_e2e_route_partial_batch" -> ((s, _) => {
      runRouteBatch(s, "rtpartb",
        """route:
          |  - source-table: route_db.(TABLEALPHA|TABLEBETA)
          |    sink-table: NEW_route_db.ALPHABET""".stripMargin) { (db, f) =>
        val ab = TableId.parse("NEW_route_db.ALPHABET")
        requireEventSequence(db, ab,
          Seq("create:ID,VERSION") ++ insLines(alphaRows) ++ insLines(betaRows))
        requireEventSequence(db, f.tids("TABLEGAMMA"),
          Seq("create:ID,VERSION") ++ insLines(gammaRows))
        requireEventSequence(db, f.tids("TABLEDELTA"),
          Seq("create:ID,VERSION") ++ insLines(deltaRows))
        unionState(s, db, Seq(ab, f.tids("TABLEGAMMA"), f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testMultipleRoute:510-595: OVERLAPPING rules —
    // (ALPHA|BETA)→ALPHABET and (BETA|GAMMA)→BETAGAMM. BETA's traffic and
    // DDL fan out to BOTH sinks (1→N route multiplicity); DELTA is default.
    "c_e2e_route_multiple" -> ((s, _) => {
      runRoutePipeline(s, "rtmulti",
        """route:
          |  - source-table: route_db.(TABLEALPHA|TABLEBETA)
          |    sink-table: NEW_route_db.ALPHABET
          |  - source-table: route_db.(TABLEBETA|TABLEGAMMA)
          |    sink-table: NEW_route_db.BETAGAMM""".stripMargin) { (db, f) =>
        val ab = TableId.parse("NEW_route_db.ALPHABET")
        val bg = TableId.parse("NEW_route_db.BETAGAMM")
        requireEventSequence(db, ab,
          Seq("create:ID,VERSION") ++ insLines(alphaRows) ++ insLines(betaRows) ++ Seq(
            insLine(3007, "7"),
            "before=[2014, 14], after=[2014, 2014], op=UPDATE, meta=()",
            "add:NAME AFTER VERSION",
            "before=[], after=[10001, 12, Derrida], op=INSERT, meta=()",
            "add:VERSION_EX AFTER NAME",
            "before=[], after=[10002, null, null, 15], op=INSERT, meta=()"))
        // BETAGAMM: GAMMA's VARCHAR(19) widens the merged VERSION to STRING
        // (the reference asserts exactly this alter, RouteE2eITCase:591) and
        // GAMMA's rename then widens VERSION_EX the same way (derived, not
        // listed by the presence-only validateResult)
        requireEventSequence(db, bg,
          Seq("create:ID,VERSION") ++ insLines(betaRows) ++ insLines(gammaRows) ++ Seq(
            "before=[2014, 14], after=[2014, 2014], op=UPDATE, meta=()",
            insLine(3019, "Emerald"),
            "add:VERSION_EX AFTER VERSION",
            "before=[], after=[10002, null, 15], op=INSERT, meta=()",
            "alter:VERSION->string",
            "alter:VERSION_EX->string",
            "before=[], after=[10003, null, Fluorite], op=INSERT, meta=()"))
        requireEventSequence(db, f.tids("TABLEDELTA"), deltaSeq)
        unionState(s, db, Seq(ab, bg, f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testMultipleRouteInBatchMode:597-662.
    "c_e2e_route_multiple_batch" -> ((s, _) => {
      runRouteBatch(s, "rtmultib",
        """route:
          |  - source-table: route_db.(TABLEALPHA|TABLEBETA)
          |    sink-table: NEW_route_db.ALPHABET
          |  - source-table: route_db.(TABLEBETA|TABLEGAMMA)
          |    sink-table: NEW_route_db.BETAGAMM""".stripMargin) { (db, f) =>
        val ab = TableId.parse("NEW_route_db.ALPHABET")
        val bg = TableId.parse("NEW_route_db.BETAGAMM")
        requireEventSequence(db, ab,
          Seq("create:ID,VERSION") ++ insLines(alphaRows) ++ insLines(betaRows))
        requireEventSequence(db, bg,
          Seq("create:ID,VERSION") ++ insLines(betaRows) ++ insLines(gammaRows))
        requireEventSequence(db, f.tids("TABLEDELTA"),
          Seq("create:ID,VERSION") ++ insLines(deltaRows))
        unionState(s, db, Seq(ab, bg, f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testOneToManyRoute:664-759: THREE rules route TABLEALPHA
    // to TABLEA/TABLEB/TABLEC — each a one-to-one terminus, so ALPHA's add
    // forwards raw (position LAST) to all three; the unrouted tables keep
    // their default flow.
    "c_e2e_route_one_to_many" -> ((s, _) => {
      runRoutePipeline(s, "rt1n",
        """route:
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEA
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEB
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEC""".stripMargin) { (db, f) =>
        val fans = Seq("TABLEA", "TABLEB", "TABLEC").map(n =>
          TableId.parse(s"NEW_route_db.$n"))
        fans.foreach(t => requireEventSequence(db, t, alphaSeq))
        requireEventSequence(db, f.tids("TABLEBETA"), betaSeq)
        requireEventSequence(db, f.tids("TABLEGAMMA"), gammaSeq)
        requireEventSequence(db, f.tids("TABLEDELTA"), deltaSeq)
        unionState(s, db,
          fans ++ Seq(f.tids("TABLEBETA"), f.tids("TABLEGAMMA"), f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testOneToManyRouteInBatchMode:761-823.
    "c_e2e_route_one_to_many_batch" -> ((s, _) => {
      runRouteBatch(s, "rt1nb",
        """route:
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEA
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEB
          |  - source-table: route_db.TABLEALPHA
          |    sink-table: NEW_route_db.TABLEC""".stripMargin) { (db, f) =>
        val fans = Seq("TABLEA", "TABLEB", "TABLEC").map(n =>
          TableId.parse(s"NEW_route_db.$n"))
        fans.foreach(t => requireEventSequence(db, t,
          Seq("create:ID,VERSION") ++ insLines(alphaRows)))
        unionState(s, db,
          fans ++ Seq(f.tids("TABLEBETA"), f.tids("TABLEGAMMA"), f.tids("TABLEDELTA")))
      }
    }),

    // RouteE2eITCase.testMergeTableRouteWithTransform:825-900: the transform
    // (`*, 'extras' AS EXTRAS`) rides the full merge — creates carry EXTRAS,
    // ALPHA's add appends AFTER EXTRAS, and every image gains the literal.
    "c_e2e_route_merge_transform" -> ((s, _) => {
      runRoutePipeline(s, "rtmt",
        """transform:
          |  - source-table: route_db.\.*
          |    projection: "*, 'extras' AS EXTRAS"
          |route:
          |  - source-table: route_db.\.*
          |    sink-table: route_db.ALL""".stripMargin) { (db, f) =>
        val all = TableId.parse("route_db.ALL")
        def ins3(id: Int, v: String) =
          s"before=[], after=[$id, $v, extras], op=INSERT, meta=()"
        requireEventSequence(db, all,
          Seq("create:ID,VERSION,EXTRAS") ++
            routeTables.flatMap(_._2.map { case (id, v) => ins3(id, v) }) ++ Seq(
            ins3(3007, "7"),
            "before=[2014, 14, extras], after=[2014, 2014, extras], op=UPDATE, meta=()",
            ins3(3019, "Emerald"),
            "before=[4024, Catalina, extras], after=[], op=DELETE, meta=()",
            "add:NAME AFTER EXTRAS",
            "before=[], after=[10001, 12, extras, Derrida], op=INSERT, meta=()",
            "add:VERSION_EX AFTER NAME",
            "before=[], after=[10002, null, extras, null, 15], op=INSERT, meta=()",
            // the width-derived alters ride through the transform too
            // (the reference asserts VERSION=STRING, RouteE2eITCase:897)
            "alter:VERSION->string",
            "alter:VERSION_EX->string",
            "before=[], after=[10003, null, extras, null, Fluorite], op=INSERT, meta=()",
            "before=[], after=[10004, null, extras, null, null], op=INSERT, meta=()"))
        unionState(s, db, Seq(all))
      }
    }),

    // RouteE2eITCase.testMergeTableRouteWithTransformInBatchMode:902-961.
    "c_e2e_route_merge_transform_batch" -> ((s, _) => {
      runRouteBatch(s, "rtmtb",
        """transform:
          |  - source-table: route_db.\.*
          |    projection: "*, 'extras' AS EXTRAS"
          |route:
          |  - source-table: route_db.\.*
          |    sink-table: route_db.ALL""".stripMargin) { (db, f) =>
        val all = TableId.parse("route_db.ALL")
        requireEventSequence(db, all,
          Seq("create:ID,VERSION,EXTRAS") ++
            routeTables.flatMap(_._2.map { case (id, v) =>
              s"before=[], after=[$id, $v, extras], op=INSERT, meta=()" }))
        unionState(s, db, Seq(all))
      }
    }),

    // RouteE2eITCase.testReplacementSymbol:963-1042: `NEW_route_db.NEW_<>`
    // with replace-symbol `<>` — the symbol substitutes INSIDE a larger
    // table name; every table keeps one-to-one flow under its new id
    // (rename/drop forwarded raw, per the reference's asserted
    // RenameColumnEvent/DropColumnEvent under the NEW_ ids).
    "c_e2e_route_replace_symbol" -> ((s, _) => {
      runRoutePipeline(s, "rtrep",
        """route:
          |  - source-table: route_db.\.*
          |    sink-table: NEW_route_db.NEW_<>
          |    replace-symbol: <>""".stripMargin) { (db, f) =>
        def renamed(n: String) = TableId.parse(s"NEW_route_db.NEW_$n")
        requireEventSequence(db, renamed("TABLEALPHA"), alphaSeq)
        requireEventSequence(db, renamed("TABLEBETA"), betaSeq)
        requireEventSequence(db, renamed("TABLEGAMMA"), gammaSeq)
        requireEventSequence(db, renamed("TABLEDELTA"), deltaSeq)
        unionState(s, db, routeTables.map(t => renamed(t._1)))
      }
    }),

    // RouteE2eITCase.testReplacementSymbolInBatchMode:1044-1106.
    "c_e2e_route_replace_symbol_batch" -> ((s, _) => {
      runRouteBatch(s, "rtrepb",
        """route:
          |  - source-table: route_db.\.*
          |    sink-table: NEW_route_db.NEW_<>
          |    replace-symbol: <>""".stripMargin) { (db, f) =>
        def renamed(n: String) = TableId.parse(s"NEW_route_db.NEW_$n")
        routeTables.foreach { case (name, rows) =>
          requireEventSequence(db, renamed(name),
            Seq("create:ID,VERSION") ++ insLines(rows))
        }
        unionState(s, db, routeTables.map(t => renamed(t._1)))
      }
    }),

    // RouteE2eITCase.testExtremeMergeTableRoute:1108-1183 (batchMode=true):
    // TEST_TABLE_NUMBER=100 tables, one row each, default route — the
    // table-count scale point, run at the reference's full 100 through the
    // BATCH path (one bounded pass per source).
    "c_e2e_route_extreme" -> ((s, _) => {
      implicit val spark: SparkSession = s
      val n = 100
      val entries = (1 to n).map { i =>
        val t = TableId.parse(s"extreme_db.TABLE$i")
        val src = new ScriptedChangeSource(
          t, schemaOf("ID" -> IntegerType, "VERSION" -> Str)("ID"),
          Seq(Map[String, Any]("ID" -> i, "VERSION" -> s"No.$i")))
        (freshId(s"rtex-$i"), t, src)
      }
      registered(entries.map(e => e._1 -> e._3): _*) {
        val runner = new PipelineRunner(YamlPipelineParser.parse(
          s"""source:
             |  type: cdc
             |  sourceId: ${entries.head._1}
             |sink:
             |  type: values
             |  record.events: true
             |pipeline:
             |  execution.runtime-mode: BATCH
             |""".stripMargin))
        runner.runBatch(extraSourceIds = entries.drop(1).map(_._1))
        val db = runner.sink.asInstanceOf[MemoryDatabase]
        entries.foreach { case (_, t, _) =>
          val i = t.tableName.stripPrefix("TABLE").toInt
          requireEventSequence(db, t, Seq(
            "create:ID,VERSION", insLine(i, s"No.$i")))
        }
        unionState(s, db, entries.map(_._2))
      }
    }),

    // testExtremeMergeTableRoute (batchMode=false): the STREAMING param at
    // the reference's FULL 100 tables — all sources multiplex through ONE
    // checkpointed streaming query (`PipelineRunner.runMultiplexedHandlingDdl`:
    // the union of the per-source DSv2 readers, per-source offsets in the
    // shared checkpoint), matching the reference's single-job topology; cost
    // is O(drain passes), not O(tables).
    "c_e2e_route_extreme_stream" -> ((s, _) => {
      implicit val spark: SparkSession = s
      val n = 100
      val entries = (1 to n).map { i =>
        val t = TableId.parse(s"extreme_db.TABLE$i")
        val src = new ScriptedChangeSource(
          t, schemaOf("ID" -> IntegerType, "VERSION" -> Str)("ID"), Seq.empty)
        (freshId(s"rtexs-$i"), t, src)
      }
      registered(entries.map(e => e._1 -> e._3): _*) {
        val ckpt = java.nio.file.Files.createTempDirectory("graft_rtexs").toString
        val runner = new PipelineRunner(YamlPipelineParser.parse(
          s"""source:
             |  type: cdc
             |  sourceId: ${entries.head._1}
             |sink:
             |  type: values
             |  record.events: true
             |pipeline:
             |  checkpoint.dir: $ckpt
             |  schema.change.behavior: EVOLVE
             |""".stripMargin))
        val extraIds = entries.drop(1).map(_._1)
        runner.runMultiplexedHandlingDdl(extraIds) // empty snapshot pass
        entries.foreach { case (_, t, src) =>
          val i = t.tableName.stripPrefix("TABLE").toInt
          src.append(DataChangeEvent.insert(t,
            Map("ID" -> i, "VERSION" -> s"No.$i")))
        }
        runner.runMultiplexedHandlingDdl(extraIds)
        val db = runner.sink.asInstanceOf[MemoryDatabase]
        entries.foreach { case (_, t, _) =>
          val i = t.tableName.stripPrefix("TABLE").toInt
          requireEventSequence(db, t, Seq(
            "create:ID,VERSION", insLine(i, s"No.$i")))
        }
        unionState(s, db, entries.map(_._2))
      }
    }))

  // ---------------------------------------------------------------------
  // SchemaEvolvingTransformE2eITCase — the transform × schema-evolution
  // interaction matrix (ddl/schema_evolve.sql fixture, two-rule transform
  // splitting on `age`, the full add/alter/rename/drop/truncate/drop-table
  // script, one behavior per test). The reference's `validateResult` lines
  // are TaskManager-stdout presence checks; here each gate pins the FULL
  // per-table sink event log and returns it as (seq, event) rows so the
  // DuckDB oracle value-compares the entire stream.
  // ---------------------------------------------------------------------

  /** the two-rule transform of testGenericSchemaEvolution
    * (SchemaEvolvingTransformE2eITCase.java:269-275): uid concat, `*`,
    * id_square (positive / negated per rule), a literal tag, dispatched on
    * the `age < 20` / `age >= 20` filters.
    */
  private val evolvingTransformYaml =
    """transform:
      |  - source-table: evolve_db.\.*
      |    projection: "CAST(id AS VARCHAR) || ' -> ' || name AS uid, *, id * id AS id_square, 'age < 20' as tag"
      |    filter: "age < 20"
      |  - source-table: evolve_db.\.*
      |    projection: "CAST(id AS VARCHAR) || ' -> ' || name AS uid, *, 0 - id * id AS id_square, 'age >= 20' as tag"
      |    filter: "age >= 20"""".stripMargin

  /** schema_evolve.sql's members rows as stream traffic. */
  private def scriptEvolveSnapshot(src: ScriptedChangeSource, t: TableId): Unit =
    Seq((1008, "Alice", 21), (1009, "Bob", 20), (1010, "Carol", 19), (1011, "Derrida", 18))
      .foreach { case (id, n, a) =>
        src.append(DataChangeEvent.insert(t, Map("id" -> id, "name" -> n, "age" -> a)))
      }

  /** the serial change script (SchemaEvolvingTransformE2eITCase.java:313-332):
    * ADD gender AFTER age + Eve, MODIFY age DOUBLE, RENAME gender, DROP
    * biological_sex + Fiona, TRUNCATE + Gem, DROP TABLE. (The reference's
    * `__fence__` row only sequences the containerized binlog — scripted
    * sources drain deterministically, so it is omitted and the asserted
    * lines stay exactly the ITCase's.)
    */
  private def scriptEvolveChanges(
      src: ScriptedChangeSource, t: TableId, drain: () => Unit): Unit = {
    src.appendDdl(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition(
      "gender", CdcTypes.TinyIntT(), AddColumnEvent.After("age")))))
    src.append(DataChangeEvent.insert(t,
      Map("id" -> 1012, "name" -> "Eve", "age" -> 17, "gender" -> 0.toByte)))
    // drain between epochs: each appended row must leave the log under the
    // schema it was written in (the binlog's serial statements land in
    // distinct micro-batches the same way)
    drain()
    src.appendDdl(AlterColumnTypeEvent(t, Map("age" -> CdcTypes.DoubleT())))
    src.appendDdl(RenameColumnEvent(t, Map("gender" -> "biological_sex")))
    src.appendDdl(DropColumnEvent(t, Seq("biological_sex")))
    src.append(DataChangeEvent.insert(t,
      Map("id" -> 1013, "name" -> "Fiona", "age" -> 16.0)))
    drain()
    src.appendDdl(TruncateTableEvent(t))
    src.append(DataChangeEvent.insert(t,
      Map("id" -> 1014, "name" -> "Gem", "age" -> 17.0)))
    drain()
    src.appendDdl(DropTableEvent(t))
  }

  private def eventLogDf(s: SparkSession, db: MemoryDatabase, t: TableId): DataFrame = {
    import s.implicits._
    db.eventHistory(t).zipWithIndex.map { case (e, i) => (i + 1, e) }
      .toDF("seq", "event").orderBy("seq")
  }

  /** run one behavior cell of the generic matrix (single members table). */
  private def runEvolvingTransform(
      s: SparkSession, tag: String, behavior: String,
      sinkExtra: String = ""): (MemoryDatabase, TableId) = {
    val t = TableId.parse("evolve_db.members")
    val src = new ScriptedChangeSource(t,
      schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
    val id = freshId(tag)
    registered(id -> src) {
      val db = runPipelineR(s, Seq(id -> src), behavior,
        extraYaml = evolvingTransformYaml, sinkExtra = sinkExtra) { (_, drain) =>
        scriptEvolveSnapshot(src, t)
        drain()
        scriptEvolveChanges(src, t, drain)
      }
      (db, t)
    }
  }

  // shared expected fragments
  private val evolveCreate = "create:uid,id,name,age,id_square,tag"
  private val evolveSnapshotLines = Seq(
    "before=[], after=[1008 -> Alice, 1008, Alice, 21, -1016064, age >= 20], op=INSERT, meta=()",
    "before=[], after=[1009 -> Bob, 1009, Bob, 20, -1018081, age >= 20], op=INSERT, meta=()",
    "before=[], after=[1010 -> Carol, 1010, Carol, 19, 1020100, age < 20], op=INSERT, meta=()",
    "before=[], after=[1011 -> Derrida, 1011, Derrida, 18, 1022121, age < 20], op=INSERT, meta=()")

  // expected full event logs, shared by the gates and their DuckDB oracles
  private val etEvolveLines =
    Seq(evolveCreate) ++ evolveSnapshotLines ++ Seq(
      "add:gender AFTER age",
      "before=[], after=[1012 -> Eve, 1012, Eve, 17, 0, 1024144, age < 20], op=INSERT, meta=()",
      "alter:age->double",
      "rename:gender->biological_sex",
      "drop:biological_sex",
      "before=[], after=[1013 -> Fiona, 1013, Fiona, 16.0, 1026169, age < 20], op=INSERT, meta=()",
      "TruncateTableEvent",
      "before=[], after=[1014 -> Gem, 1014, Gem, 17.0, 1028196, age < 20], op=INSERT, meta=()",
      "DropTableEvent")
  private val etMergeLines =
    Seq(evolveCreate) ++ evolveSnapshotLines ++ Seq(
      "add:gender AFTER tag",
      "before=[], after=[1012 -> Eve, 1012, Eve, 17, 1024144, age < 20, 0], op=INSERT, meta=()",
      "alter:age->double",
      "add:biological_sex AFTER gender",
      "before=[], after=[1013 -> Fiona, 1013, Fiona, 16.0, 1026169, age < 20, null, null], op=INSERT, meta=()",
      "before=[], after=[1014 -> Gem, 1014, Gem, 17.0, 1028196, age < 20, null, null], op=INSERT, meta=()")
  private val etDegradedLines =
    Seq(evolveCreate) ++ evolveSnapshotLines ++ Seq(
      "before=[], after=[1012 -> Eve, 1012, Eve, 17, 1024144, age < 20], op=INSERT, meta=()",
      "before=[], after=[1013 -> Fiona, 1013, Fiona, null, 1026169, age < 20], op=INSERT, meta=()",
      "before=[], after=[1014 -> Gem, 1014, Gem, null, 1028196, age < 20], op=INSERT, meta=()")
  private val etLenientLines =
    Seq(evolveCreate) ++ evolveSnapshotLines ++ Seq(
      "add:gender",
      "before=[], after=[1012 -> Eve, 1012, Eve, 17, 1024144, age < 20, 0], op=INSERT, meta=()",
      "alter:age->double",
      "add:biological_sex",
      "before=[], after=[1013 -> Fiona, 1013, Fiona, 16.0, 1026169, age < 20, null, null], op=INSERT, meta=()",
      "TruncateTableEvent",
      "before=[], after=[1014 -> Gem, 1014, Gem, 17.0, 1028196, age < 20, null, null], op=INSERT, meta=()",
      "DropTableEvent")
  private val etFineGrainedLines =
    Seq(evolveCreate) ++ evolveSnapshotLines ++ Seq(
      "add:gender AFTER age",
      "before=[], after=[1012 -> Eve, 1012, Eve, 17, 0, 1024144, age < 20], op=INSERT, meta=()",
      "alter:age->double",
      "rename:gender->biological_sex",
      "before=[], after=[1013 -> Fiona, 1013, Fiona, 16.0, null, 1026169, age < 20], op=INSERT, meta=()",
      "TruncateTableEvent",
      "before=[], after=[1014 -> Gem, 1014, Gem, 17.0, null, 1028196, age < 20], op=INSERT, meta=()")

  private def eventValuesSql(lines: Seq[String]): String =
    lines.zipWithIndex.map { case (l, i) => s"(${i + 1}, '${l.replace("'", "''")}')" }
      .mkString("SELECT * FROM (VALUES\n  ", ",\n  ", ")\nAS t(seq, event) ORDER BY seq")

  private val evolvingTransformQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SchemaEvolvingTransformE2eITCase.testSchemaEvolve:58-75 (EVOLVE): every
    // change flows through the transform — the add re-derives AFTER age in
    // the transformed shape, the alter retypes age DOUBLE, rename + drop pass
    // through, TRUNCATE wipes and DROP TABLE removes the sink table.
    "c_e2e_evolving_transform_evolve" -> ((s, _) => {
      val (db, t) = runEvolvingTransform(s, "etevo", "EVOLVE")
      requireEventSequence(db, t, etEvolveLines)
      eventLogDf(s, db, t)
    }),

    // testSchemaEvolveWithIncompatibleChanges:77-91 (EVOLVE + route-merge of
    // members|new_members → merged): the merged diff appends gender AFTER
    // tag, the rename surfaces as ADD biological_sex AFTER gender, drop /
    // truncate / drop-table derive NO diff (the merged sink keeps everything).
    "c_e2e_evolving_transform_merge" -> ((s, _) => {
      val t1 = TableId.parse("evolve_db.members")
      val t2 = TableId.parse("evolve_db.new_members")
      val src1 = new ScriptedChangeSource(t1,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val src2 = new ScriptedChangeSource(t2,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val (id1, id2) = (freshId("etmerge1"), freshId("etmerge2"))
      registered(id1 -> src1, id2 -> src2) {
        val db = runPipeline(s, Seq(id1 -> src1, id2 -> src2), "EVOLVE",
          extraYaml = evolvingTransformYaml +
            """
              |route:
              |  - source-table: evolve_db.(members|new_members)
              |    sink-table: evolve_db.merged""".stripMargin) { drain =>
          scriptEvolveSnapshot(src1, t1)
          drain()
          scriptEvolveChanges(src1, t1, drain)
        }
        val merged = TableId.parse("evolve_db.merged")
        requireEventSequence(db, merged, etMergeLines)
        eventLogDf(s, db, merged)
      }
    }),

    // testSchemaEvolveWithException:93-106 (EVOLVE + error.on.schema.change,
    // here the sink's reject.ddl surface): the first refused change faults
    // the job — "Failed to apply schema change event."
    "c_e2e_evolving_transform_evolve_error" -> ((s, _) => {
      val t = TableId.parse("evolve_db.members")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("eterr")
      var faulted: Option[Throwable] = None
      registered(id -> src) {
        try {
          runPipelineR(s, Seq(id -> src), "EVOLVE",
            extraYaml = evolvingTransformYaml,
            sinkExtra = "  reject.ddl: ADD_COLUMN,ALTER_COLUMN_TYPE,RENAME_COLUMN," +
              "DROP_COLUMN,TRUNCATE_TABLE,DROP_TABLE") { (_, drain) =>
            scriptEvolveSnapshot(src, t)
            drain()
            scriptEvolveChanges(src, t,
              () => try drain()
                catch { case e: Throwable => faulted = Some(e); throw e })
          }
          sys.error("EVOLVE must fault when the sink refuses the change")
        } catch { case _: Throwable if faulted.isDefined => () }
        def cites(e: Throwable): Boolean =
          Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
            .exists(c => String.valueOf(c.getMessage).contains("ADD_COLUMN"))
        require(faulted.exists(cites),
          s"fault must cite the refused ADD_COLUMN, got $faulted")
        import s.implicits._
        Seq(("EVOLVE", true)).toDF("behavior", "faulted")
      }
    }),

    // testSchemaTryEvolveWithException:108-127 (TRY_EVOLVE + rejecting sink):
    // every change is refused but the pipeline degrades instead of faulting —
    // the sink keeps the CREATE shape, gender never lands, and post-alter
    // DOUBLE ages NULL on the non-widening INT coercion; the rejected
    // TRUNCATE leaves prior rows in place.
    "c_e2e_evolving_transform_try_evolve_error" -> ((s, _) => {
      val (db, t) = runEvolvingTransform(s, "ettry", "TRY_EVOLVE",
        sinkExtra = "  reject.ddl: ADD_COLUMN,ALTER_COLUMN_TYPE,RENAME_COLUMN," +
          "DROP_COLUMN,TRUNCATE_TABLE,DROP_TABLE")
      requireEventSequence(db, t, etDegradedLines)
      eventLogDf(s, db, t)
    }),

    // testSchemaIgnore:129-141 (IGNORE): only creates apply; the data lines
    // coerce to the CREATE shape exactly like the rejected-TRY_EVOLVE twin.
    "c_e2e_evolving_transform_ignore" -> ((s, _) => {
      val (db, t) = runEvolvingTransform(s, "etign", "IGNORE")
      requireEventSequence(db, t, etDegradedLines)
      eventLogDf(s, db, t)
    }),

    // testSchemaException:143-154 (EXCEPTION): the first non-create change
    // faults the job with the reference's EXCEPTION-mode message.
    "c_e2e_evolving_transform_exception" -> ((s, _) => {
      val t = TableId.parse("evolve_db.members")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("etexc")
      var faulted: Option[Throwable] = None
      registered(id -> src) {
        try {
          runPipelineR(s, Seq(id -> src), "EXCEPTION",
            extraYaml = evolvingTransformYaml) { (_, drain) =>
            scriptEvolveSnapshot(src, t)
            drain()
            scriptEvolveChanges(src, t,
              () => try drain()
                catch { case e: Throwable => faulted = Some(e); throw e })
          }
          sys.error("EXCEPTION behavior must fault on the first schema change")
        } catch { case _: Throwable if faulted.isDefined => () }
        require(faulted.exists(e =>
          Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
            .exists(c => String.valueOf(c.getMessage).contains("EXCEPTION"))),
          s"fault must cite EXCEPTION mode, got $faulted")
        import s.implicits._
        Seq(("EXCEPTION", true)).toDF("behavior", "faulted")
      }
    }),

    // testLenientSchemaEvolution:156-170 (LENIENT): the add loses its AFTER
    // position (appended LAST), the rename surfaces as ADD biological_sex,
    // the drop is swallowed (nullable column — no nullable-izing alter).
    "c_e2e_evolving_transform_lenient" -> ((s, _) => {
      val (db, t) = runEvolvingTransform(s, "etlen", "LENIENT")
      requireEventSequence(db, t, etLenientLines)
      eventLogDf(s, db, t)
    }),

    // testFineGrainedSchemaEvolution:172-191 (EVOLVE +
    // exclude.schema.changes: drop): DropColumn and DropTable are filtered at
    // the sink boundary — biological_sex survives its drop (NULL afterwards)
    // and the table survives its DROP TABLE; TRUNCATE still applies.
    "c_e2e_evolving_transform_fine_grained" -> ((s, _) => {
      val (db, t) = runEvolvingTransform(s, "etfine", "EVOLVE",
        sinkExtra = "  exclude.schema.changes: drop")
      requireEventSequence(db, t, etFineGrainedLines)
      eventLogDf(s, db, t)
    }),

    // testUnexpectedBehavior:193-222: `schema.change.behavior: unexpected`
    // must refuse at submission (the reference's job never starts).
    "c_e2e_unexpected_behavior" -> ((s, _) => {
      implicit val spark: SparkSession = s
      val refused =
        try {
          new PipelineRunner(YamlPipelineParser.parse(
            """source:
              |  type: cdc
              |  sourceId: never-resolved
              |sink:
              |  type: values
              |pipeline:
              |  schema.change.behavior: unexpected
              |""".stripMargin))
          None
        } catch { case e: IllegalArgumentException => Some(e) }
      require(refused.exists(_.getMessage.contains("Unexpected schema change behavior")),
        s"submission must refuse the unknown behavior, got $refused")
      import s.implicits._
      Seq(("unexpected", true)).toDF("behavior", "refused")
    }))

  // ---------------------------------------------------------------------
  // TransformE2eITCase + SchemaEvolveE2eITCase — the non-overlapping
  // remainder (ddl/transform_test.sql fixture). Methods NOT ported here are
  // subsumed by existing composer-tree gates, cited method-by-method:
  //  - testMultipleTransformRule → c_conformance_multi_dispatch (Type-A/B
  //    first-match split), c_conformance_batch_transform_twice (batch param)
  //  - testAssortedSchemaTransform / testWildcardSchemaTransform →
  //    c_conformance_calculated_columns + c_conformance_shade_different_type
  //    (CONCAT/LOWER computed + wildcard-shaded columns)
  //  - testWildcardWithMetadataColumnTransform →
  //    c_conformance_metadata_wildcard + c_conformance_batch_optype_metadata
  //    (typed op_ts AS opts, batch param)
  //  - testMultipleTransformWithDiffRefColumn →
  //    c_conformance_dispatch_ref_cols (per-rule distinct referenced columns)
  //  - testTemporalFunctions (local-time-zone America/Los_Angeles) →
  //    c_conformance_temporal_functions (the epoch-pinned NOW-family matrix
  //    already runs UTC/Berlin/Shanghai through the same zone plumbing)
  //  - testTransformWildcardPrefixWithSchemaEvolution /
  //    testTransformWildcardSuffixWithSchemaEvolution →
  //    c_conformance_pre_asterisk_evolution / c_conformance_post_asterisk_evolution
  //  - testTransformWithUnicodeLiterals → c_conformance_unicode_projection /
  //    _filter / _matrix
  //  - SchemaEvolveE2eITCase's behavior matrix (testSchemaEvolve,
  //    testSchemaEvolveWithIncompatibleChanges, testSchemaEvolveWithException,
  //    testSchemaTryEvolveWithException, testSchemaIgnore, testSchemaException,
  //    testLenientSchemaEvolution, testFineGrainedSchemaEvolution) → the
  //    c_e2e_evolving_transform_* family above runs the SAME YAML matrix with
  //    the transform block added (the strictly-larger crossing), and the
  //    composer ports (c_conformance_ignore/exception/try_evolve_behavior,
  //    c_conformance_fine_grained, c_conformance_lenient_evolves) pin the
  //    transform-less halves; testUnexpectedBehavior → c_e2e_unexpected_behavior.
  //  - UdfE2eITCase.testUserDefinedFunctions/testFlinkCompatibleScalarFunctions
  //    (java halves; python param is environment-n/a) →
  //    c_conformance_udf_transform / _filter / _flink_transform / _flink_filter
  //    + t_udf / t_udf2 (same classes, same projections through the UDF registry)
  // ---------------------------------------------------------------------

  private val alphaT = TableId.parse("transform_db.TABLEALPHA")
  private val betaT = TableId.parse("transform_db.TABLEBETA")

  private def transformFixture(tag: String, snapshot: Boolean)
      : (String, ScriptedChangeSource, String, ScriptedChangeSource) = {
    val alphaSchema = schemaOf("ID" -> IntegerType, "VERSION" -> Str,
      "PRICEALPHA" -> IntegerType, "AGEALPHA" -> IntegerType, "NAMEALPHA" -> Str)("ID")
    val betaSchema = schemaOf("ID" -> IntegerType, "VERSION" -> Str,
      "CODENAMESBETA" -> Str, "AGEBETA" -> IntegerType, "NAMEBETA" -> Str)("ID")
    val aRows = Seq(
      Map[String, Any]("ID" -> 1008, "VERSION" -> "8", "PRICEALPHA" -> 199,
        "AGEALPHA" -> 17, "NAMEALPHA" -> "Alice"),
      Map[String, Any]("ID" -> 1009, "VERSION" -> "8.1", "PRICEALPHA" -> 0,
        "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob"),
      Map[String, Any]("ID" -> 1010, "VERSION" -> "10", "PRICEALPHA" -> 99,
        "AGEALPHA" -> 19, "NAMEALPHA" -> "Carol"),
      Map[String, Any]("ID" -> 1011, "VERSION" -> "11", "PRICEALPHA" -> 59,
        "AGEALPHA" -> 20, "NAMEALPHA" -> "Dave"))
    val bRows = Seq(
      Map[String, Any]("ID" -> 2011, "VERSION" -> "11", "CODENAMESBETA" -> "Big Sur",
        "AGEBETA" -> 21, "NAMEBETA" -> "Eva"),
      Map[String, Any]("ID" -> 2012, "VERSION" -> "12", "CODENAMESBETA" -> "Monterey",
        "AGEBETA" -> 22, "NAMEBETA" -> "Fred"),
      Map[String, Any]("ID" -> 2013, "VERSION" -> "13", "CODENAMESBETA" -> "Ventura",
        "AGEBETA" -> 23, "NAMEBETA" -> "Gus"),
      Map[String, Any]("ID" -> 2014, "VERSION" -> "14", "CODENAMESBETA" -> "Sonoma",
        "AGEBETA" -> 24, "NAMEBETA" -> "Henry"))
    val srcA = new ScriptedChangeSource(alphaT, alphaSchema, if (snapshot) aRows else Seq.empty)
    val srcB = new ScriptedChangeSource(betaT, betaSchema, if (snapshot) bRows else Seq.empty)
    if (!snapshot) {
      aRows.foreach(r => srcA.append(DataChangeEvent.insert(alphaT, r)))
      bRows.foreach(r => srcB.append(DataChangeEvent.insert(betaT, r)))
    }
    (freshId(s"$tag-a"), srcA, freshId(s"$tag-b"), srcB)
  }

  /** the shared incremental block (UPDATE 1009, INSERT 3007, DELETE 2011). */
  private def scriptTransformIncremental(
      srcA: ScriptedChangeSource, srcB: ScriptedChangeSource, age3007: Int): Unit = {
    srcA.append(DataChangeEvent.update(alphaT,
      Map("ID" -> 1009, "VERSION" -> "8.1", "PRICEALPHA" -> 0,
        "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob"),
      Map("ID" -> 1009, "VERSION" -> "100", "PRICEALPHA" -> 0,
        "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob")))
    srcA.append(DataChangeEvent.insert(alphaT,
      Map("ID" -> 3007, "VERSION" -> "7", "PRICEALPHA" -> 79,
        "AGEALPHA" -> age3007, "NAMEALPHA" -> "IINA")))
    srcB.append(DataChangeEvent.delete(betaT,
      Map("ID" -> 2011, "VERSION" -> "11", "CODENAMESBETA" -> "Big Sur",
        "AGEBETA" -> 21, "NAMEBETA" -> "Eva")))
  }

  private val lenientRouteLines = Seq(
    "create:id,name,age",
    "before=[], after=[1008, Alice, 21], op=INSERT, meta=()",
    "before=[], after=[1009, Bob, 20], op=INSERT, meta=()",
    "before=[], after=[1010, Carol, 19], op=INSERT, meta=()",
    "before=[], after=[1011, Derrida, 18], op=INSERT, meta=()",
    "add:gender",
    "before=[], after=[1012, Eve, 17, 0], op=INSERT, meta=()",
    "alter:age->double",
    "add:precise_age",
    "add:biological_sex",
    "before=[], after=[1013, Fiona, null, null, 16.0, null], op=INSERT, meta=()",
    "TruncateTableEvent",
    "before=[], after=[1014, Gem, null, null, 17.0, null], op=INSERT, meta=()",
    "DropTableEvent")

  private val bypassLines = Seq(
    "create:id,name,age",
    "before=[], after=[1008, Alice, 21], op=INSERT, meta=()",
    "before=[], after=[1009, Bob, 20], op=INSERT, meta=()",
    "before=[], after=[1010, Carol, 19], op=INSERT, meta=()",
    "before=[], after=[1011, Derrida, 18], op=INSERT, meta=()",
    "add:gender AFTER age",
    "before=[], after=[1012, Eve, 17, 0], op=INSERT, meta=()",
    "alter:age->double",
    "rename:age->precise_age",
    "rename:gender->biological_sex",
    "drop:biological_sex",
    "before=[], after=[1013, Fiona, 16.0], op=INSERT, meta=()",
    "TruncateTableEvent",
    "before=[], after=[1014, Gem, 17.0], op=INSERT, meta=()",
    "DropTableEvent")

  /** the with-schema fixture lines (debezium-json-with-schema.txt,
    * customers half, $databaseName → kafka_db), sorted like the gate's
    * read-back. */
  private val kafkaSchemaLines: Seq[String] = {
    val imageSchema =
      """{"type":"struct","fields":[{"type":"int32","optional":false,"field":"id"},""" +
        """{"type":"string","optional":false,"default":"flink","field":"name"},""" +
        """{"type":"string","optional":true,"field":"address"},""" +
        """{"type":"string","optional":true,"field":"phone_number"}]"""
    (1 to 4).map { i =>
      """{"schema":{"type":"struct","fields":[""" +
        imageSchema + ""","optional":true,"field":"before"},""" +
        imageSchema + ""","optional":true,"field":"after"}],"optional":false},""" +
        s""""payload":{"before":null,"after":{"id":${100 + i},"name":"user_$i",""" +
        """"address":"Shanghai","phone_number":"123567891234"},"op":"c",""" +
        """"source":{"db":"kafka_db","table":"customers"}}}"""
    }.sorted
  }

  private val transformE2eQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TransformE2eITCase.testHeteroSchemaTransform:80-166 (streaming param):
    // two differently-shaped tables each NORMALIZED to (ID, VERSION) by its
    // own rule, then route-merged into one terminus; ALPHA filters ID > 1008.
    // (The reference's presence list omits row 2013 — unfiltered, it lands;
    // the exact sequence includes it.)
    "c_e2e_transform_hetero" -> ((s, _) => {
      val (idA, srcA, idB, srcB) = transformFixture("hetero", snapshot = false)
      registered(idA -> srcA, idB -> srcB) {
        val db = runPipeline(s, Seq(idA -> srcA, idB -> srcB), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: transform_db.TABLEALPHA
              |    projection: "ID, VERSION"
              |    filter: "ID > 1008"
              |  - source-table: transform_db.TABLEBETA
              |    projection: "ID, VERSION"
              |route:
              |  - source-table: transform_db.\.*
              |    sink-table: transform_db.terminus""".stripMargin) { drain =>
          drain()
          scriptTransformIncremental(srcA, srcB, age3007 = 16)
        }
        val terminus = TableId.parse("transform_db.terminus")
        requireEventSequence(db, terminus, Seq(
          "create:ID,VERSION",
          insLine(1009, "8.1"), insLine(1010, "10"), insLine(1011, "11"),
          insLine(2011, "11"), insLine(2012, "12"), insLine(2013, "13"), insLine(2014, "14"),
          "before=[1009, 8.1], after=[1009, 100], op=UPDATE, meta=()",
          insLine(3007, "7"),
          "before=[2011, 11], after=[], op=DELETE, meta=()"))
        unionState(s, db, Seq(terminus))
      }
    }),

    // testHeteroSchemaTransform (batchMode=true): snapshot + BATCH.
    "c_e2e_transform_hetero_batch" -> ((s, _) => {
      implicit val spark: SparkSession = s
      val (idA, srcA, idB, srcB) = transformFixture("heterob", snapshot = true)
      registered(idA -> srcA, idB -> srcB) {
        val runner = new PipelineRunner(YamlPipelineParser.parse(
          s"""source:
             |  type: cdc
             |  sourceId: $idA
             |sink:
             |  type: values
             |  record.events: true
             |transform:
             |  - source-table: transform_db.TABLEALPHA
             |    projection: "ID, VERSION"
             |    filter: "ID > 1008"
             |  - source-table: transform_db.TABLEBETA
             |    projection: "ID, VERSION"
             |route:
             |  - source-table: transform_db.\\.*
             |    sink-table: transform_db.terminus
             |pipeline:
             |  execution.runtime-mode: BATCH
             |""".stripMargin))
        runner.runBatch(extraSourceIds = Seq(idB))
        val db = runner.sink.asInstanceOf[MemoryDatabase]
        val terminus = TableId.parse("transform_db.terminus")
        requireEventSequence(db, terminus, Seq(
          "create:ID,VERSION",
          insLine(1009, "8.1"), insLine(1010, "10"), insLine(1011, "11"),
          insLine(2011, "11"), insLine(2012, "12"), insLine(2013, "13"), insLine(2014, "14")))
        unionState(s, db, Seq(terminus))
      }
    }),

    // TransformE2eITCase.testMultipleHittingTable:514-592: ONE wildcard rule
    // (`TABLE\.*`) hits BOTH differently-shaped tables — `*` expands
    // per-table, the computed UID/NEWVERSION append after each table's own
    // columns, and both images of the update/delete carry the computed pair.
    "c_e2e_multiple_hitting" -> ((s, _) => {
      val (idA, srcA, idB, srcB) = transformFixture("mhit", snapshot = false)
      registered(idA -> srcA, idB -> srcB) {
        val db = runPipeline(s, Seq(idA -> srcA, idB -> srcB), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: transform_db.TABLE\.*
              |    projection: "*, ID + 1000 as UID, VERSION AS NEWVERSION"""".stripMargin) { drain =>
          drain()
          scriptTransformIncremental(srcA, srcB, age3007 = 25)
        }
        requireEventSequence(db, alphaT, Seq(
          "create:ID,VERSION,PRICEALPHA,AGEALPHA,NAMEALPHA,UID,NEWVERSION",
          "before=[], after=[1008, 8, 199, 17, Alice, 2008, 8], op=INSERT, meta=()",
          "before=[], after=[1009, 8.1, 0, 18, Bob, 2009, 8.1], op=INSERT, meta=()",
          "before=[], after=[1010, 10, 99, 19, Carol, 2010, 10], op=INSERT, meta=()",
          "before=[], after=[1011, 11, 59, 20, Dave, 2011, 11], op=INSERT, meta=()",
          "before=[1009, 8.1, 0, 18, Bob, 2009, 8.1], after=[1009, 100, 0, 18, Bob, 2009, 100], op=UPDATE, meta=()",
          "before=[], after=[3007, 7, 79, 25, IINA, 4007, 7], op=INSERT, meta=()"))
        requireEventSequence(db, betaT, Seq(
          "create:ID,VERSION,CODENAMESBETA,AGEBETA,NAMEBETA,UID,NEWVERSION",
          "before=[], after=[2011, 11, Big Sur, 21, Eva, 3011, 11], op=INSERT, meta=()",
          "before=[], after=[2012, 12, Monterey, 22, Fred, 3012, 12], op=INSERT, meta=()",
          "before=[], after=[2013, 13, Ventura, 23, Gus, 3013, 13], op=INSERT, meta=()",
          "before=[], after=[2014, 14, Sonoma, 24, Henry, 3014, 14], op=INSERT, meta=()",
          "before=[2011, 11, Big Sur, 21, Eva, 3011, 11], after=[], op=DELETE, meta=()"))
        unionState(s, db, Seq(alphaT, betaT))
      }
    }),

    // testMultipleHittingTable (batchMode=true).
    "c_e2e_multiple_hitting_batch" -> ((s, _) => {
      implicit val spark: SparkSession = s
      val (idA, srcA, idB, srcB) = transformFixture("mhitb", snapshot = true)
      registered(idA -> srcA, idB -> srcB) {
        val runner = new PipelineRunner(YamlPipelineParser.parse(
          s"""source:
             |  type: cdc
             |  sourceId: $idA
             |sink:
             |  type: values
             |  record.events: true
             |transform:
             |  - source-table: transform_db.TABLE\\.*
             |    projection: "*, ID + 1000 as UID, VERSION AS NEWVERSION"
             |pipeline:
             |  execution.runtime-mode: BATCH
             |""".stripMargin))
        runner.runBatch(extraSourceIds = Seq(idB))
        val db = runner.sink.asInstanceOf[MemoryDatabase]
        requireEventSequence(db, alphaT, Seq(
          "create:ID,VERSION,PRICEALPHA,AGEALPHA,NAMEALPHA,UID,NEWVERSION",
          "before=[], after=[1008, 8, 199, 17, Alice, 2008, 8], op=INSERT, meta=()",
          "before=[], after=[1009, 8.1, 0, 18, Bob, 2009, 8.1], op=INSERT, meta=()",
          "before=[], after=[1010, 10, 99, 19, Carol, 2010, 10], op=INSERT, meta=()",
          "before=[], after=[1011, 11, 59, 20, Dave, 2011, 11], op=INSERT, meta=()"))
        requireEventSequence(db, betaT, Seq(
          "create:ID,VERSION,CODENAMESBETA,AGEBETA,NAMEBETA,UID,NEWVERSION",
          "before=[], after=[2011, 11, Big Sur, 21, Eva, 3011, 11], op=INSERT, meta=()",
          "before=[], after=[2012, 12, Monterey, 22, Fred, 3012, 12], op=INSERT, meta=()",
          "before=[], after=[2013, 13, Ventura, 23, Gus, 3013, 13], op=INSERT, meta=()",
          "before=[], after=[2014, 14, Sonoma, 24, Henry, 3014, 14], op=INSERT, meta=()"))
        unionState(s, db, Seq(alphaT, betaT))
      }
    }),

    // TransformE2eITCase.testTransformWithCast:674-753: CAST(VERSION AS
    // DOUBLE) + 100 retypes the projected column DOUBLE (never-throwing
    // dialect cast over numeric strings), CAST(AGE AS VARCHAR) || concat
    // builds IDENTIFIER; ALPHA filters AGEALPHA < 19 — the update's BOTH
    // images re-cast ("8.1"→108.1 before, "100"→200.0 after).
    "c_e2e_transform_cast" -> ((s, _) => {
      val (idA, srcA, idB, srcB) = transformFixture("tcast", snapshot = false)
      registered(idA -> srcA, idB -> srcB) {
        val db = runPipeline(s, Seq(idA -> srcA, idB -> srcB), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: transform_db.TABLEALPHA
              |    projection: "ID, CAST(VERSION AS DOUBLE) + 100 AS VERSION, CAST(AGEALPHA AS VARCHAR) || ' - ' || NAMEALPHA AS IDENTIFIER"
              |    filter: "AGEALPHA < 19"
              |  - source-table: transform_db.TABLEBETA
              |    projection: "ID, CAST(VERSION AS DOUBLE) + 100 AS VERSION, CAST(AGEBETA AS VARCHAR) || ' - ' || NAMEBETA AS IDENTIFIER"""".stripMargin) { drain =>
          drain()
          scriptTransformIncremental(srcA, srcB, age3007 = 16)
        }
        requireEventSequence(db, alphaT, Seq(
          "create:ID,VERSION,IDENTIFIER",
          "before=[], after=[1008, 108.0, 17 - Alice], op=INSERT, meta=()",
          "before=[], after=[1009, 108.1, 18 - Bob], op=INSERT, meta=()",
          "before=[1009, 108.1, 18 - Bob], after=[1009, 200.0, 18 - Bob], op=UPDATE, meta=()",
          "before=[], after=[3007, 107.0, 16 - IINA], op=INSERT, meta=()"))
        requireEventSequence(db, betaT, Seq(
          "create:ID,VERSION,IDENTIFIER",
          "before=[], after=[2011, 111.0, 21 - Eva], op=INSERT, meta=()",
          "before=[], after=[2012, 112.0, 22 - Fred], op=INSERT, meta=()",
          "before=[], after=[2013, 113.0, 23 - Gus], op=INSERT, meta=()",
          "before=[], after=[2014, 114.0, 24 - Henry], op=INSERT, meta=()",
          "before=[2011, 111.0, 21 - Eva], after=[], op=DELETE, meta=()"))
        unionState(s, db, Seq(alphaT, betaT))
      }
    }),

    // TransformE2eITCase.testTransformWithSchemaEvolution:798-890: an
    // EXPLICIT projection (ID, computed UID, PRICEALPHA AS PRICE) through a
    // full evolution of columns it does NOT reference — no downstream DDL
    // derives, and an UPDATE whose change lies entirely in a dropped column
    // still emits (with identical projected images).
    "c_e2e_transform_evolution" -> ((s, _) => {
      val alphaSchema = schemaOf("ID" -> IntegerType, "VERSION" -> Str,
        "PRICEALPHA" -> IntegerType, "AGEALPHA" -> IntegerType, "NAMEALPHA" -> Str)("ID")
      val src = new ScriptedChangeSource(alphaT, alphaSchema, Seq.empty)
      val id = freshId("tevo")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: transform_db.TABLEALPHA
              |    projection: "ID, 'id -> ' || ID AS UID, PRICEALPHA AS PRICE"
              |    filter: "ID > 1008"""".stripMargin) { drain =>
          Seq(
            Map[String, Any]("ID" -> 1008, "VERSION" -> "8", "PRICEALPHA" -> 199,
              "AGEALPHA" -> 17, "NAMEALPHA" -> "Alice"),
            Map[String, Any]("ID" -> 1009, "VERSION" -> "8.1", "PRICEALPHA" -> 0,
              "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob"),
            Map[String, Any]("ID" -> 1010, "VERSION" -> "10", "PRICEALPHA" -> 99,
              "AGEALPHA" -> 19, "NAMEALPHA" -> "Carol"),
            Map[String, Any]("ID" -> 1011, "VERSION" -> "11", "PRICEALPHA" -> 59,
              "AGEALPHA" -> 20, "NAMEALPHA" -> "Dave"))
            .foreach(r => src.append(DataChangeEvent.insert(alphaT, r)))
          drain()
          src.append(DataChangeEvent.update(alphaT,
            Map("ID" -> 1009, "VERSION" -> "8.1", "PRICEALPHA" -> 0,
              "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob"),
            Map("ID" -> 1009, "VERSION" -> "100", "PRICEALPHA" -> 0,
              "AGEALPHA" -> 18, "NAMEALPHA" -> "Bob")))
          src.append(DataChangeEvent.insert(alphaT,
            Map("ID" -> 3007, "VERSION" -> "7", "PRICEALPHA" -> 79,
              "AGEALPHA" -> 16, "NAMEALPHA" -> "IINA")))
          drain()
          // the evolution block (:862-881): two adds + a 7-col insert,
          // CHANGE COLUMN (alter+rename), rename, drop + shorter inserts
          src.appendDdl(AddColumnEvent(alphaT, Seq(AddColumnEvent.ColumnWithPosition(
            "CODENAME", CdcTypes.TinyIntT(), AddColumnEvent.After("VERSION")))))
          src.appendDdl(AddColumnEvent(alphaT, Seq(AddColumnEvent.ColumnWithPosition(
            "LAST", CdcTypes.VarCharT(17)))))
          src.append(DataChangeEvent.insert(alphaT,
            Map("ID" -> 3008, "VERSION" -> "8", "CODENAME" -> 8.toByte, "PRICEALPHA" -> 80,
              "AGEALPHA" -> 17, "NAMEALPHA" -> "Jazz", "LAST" -> "Last")))
          src.appendDdl(AlterColumnTypeEvent(alphaT, Map("CODENAME" -> CdcTypes.DoubleT())))
          src.appendDdl(RenameColumnEvent(alphaT, Map("CODENAME" -> "CODE_NAME")))
          src.appendDdl(RenameColumnEvent(alphaT, Map("CODE_NAME" -> "CODE_NAME_EX")))
          src.append(DataChangeEvent.insert(alphaT,
            Map("ID" -> 3009, "VERSION" -> "9", "CODE_NAME_EX" -> 9.0, "PRICEALPHA" -> 90,
              "AGEALPHA" -> 18, "NAMEALPHA" -> "Keka", "LAST" -> "Finale")))
          src.appendDdl(DropColumnEvent(alphaT, Seq("CODE_NAME_EX")))
          src.append(DataChangeEvent.insert(alphaT,
            Map("ID" -> 3010, "VERSION" -> "10", "PRICEALPHA" -> 10,
              "AGEALPHA" -> 97, "NAMEALPHA" -> "Lynx")))
        }
        requireEventSequence(db, alphaT, Seq(
          "create:ID,UID,PRICE",
          "before=[], after=[1009, id -> 1009, 0], op=INSERT, meta=()",
          "before=[], after=[1010, id -> 1010, 99], op=INSERT, meta=()",
          "before=[], after=[1011, id -> 1011, 59], op=INSERT, meta=()",
          "before=[1009, id -> 1009, 0], after=[1009, id -> 1009, 0], op=UPDATE, meta=()",
          "before=[], after=[3007, id -> 3007, 79], op=INSERT, meta=()",
          "before=[], after=[3008, id -> 3008, 80], op=INSERT, meta=()",
          "before=[], after=[3009, id -> 3009, 90], op=INSERT, meta=()",
          "before=[], after=[3010, id -> 3010, 10], op=INSERT, meta=()"))
        unionState(s, db, Seq(alphaT))
      }
    }),

    // SchemaEvolveE2eITCase.testLenientWithRoute:204-293: LENIENT through a
    // one-to-one RENAMING route — the CHANGE COLUMN's alter passes through
    // but its rename (and gender's) surface as ADDs at LAST, the drop is
    // swallowed, and post-change rows null every column the upstream no
    // longer carries.
    "c_e2e_lenient_route" -> ((s, _) => {
      val t = TableId.parse("evolve_db.members")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("lenroute")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "LENIENT",
          extraYaml =
            """route:
              |  - source-table: evolve_db.members
              |    sink-table: evolve_db.redirect""".stripMargin) { drain =>
          scriptEvolveSnapshot(src, t)
          drain()
          src.appendDdl(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition(
            "gender", CdcTypes.TinyIntT(), AddColumnEvent.After("age")))))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1012, "name" -> "Eve", "age" -> 17, "gender" -> 0.toByte)))
          drain()
          // CHANGE COLUMN age precise_age DOUBLE → alter + rename
          src.appendDdl(AlterColumnTypeEvent(t, Map("age" -> CdcTypes.DoubleT())))
          src.appendDdl(RenameColumnEvent(t, Map("age" -> "precise_age")))
          src.appendDdl(RenameColumnEvent(t, Map("gender" -> "biological_sex")))
          src.appendDdl(DropColumnEvent(t, Seq("biological_sex")))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1013, "name" -> "Fiona", "precise_age" -> 16.0)))
          drain()
          src.appendDdl(TruncateTableEvent(t))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1014, "name" -> "Gem", "precise_age" -> 17.0)))
          drain()
          src.appendDdl(DropTableEvent(t))
        }
        val redirect = TableId.parse("evolve_db.redirect")
        requireEventSequence(db, redirect, lenientRouteLines)
        eventLogDf(s, db, redirect)
      }
    }),

    // SchemaEvolveE2eITCase.testByDefaultTransform:324-414: a transform rule
    // matching NOTHING (another.irrelevant) — the transform operator must
    // BYPASS unmatched tables untouched through the full evolution script
    // (EVOLVE), including the CHANGE COLUMN decomposition and table events.
    "c_e2e_bypass_transform" -> ((s, _) => {
      val t = TableId.parse("evolve_db.members")
      val src = new ScriptedChangeSource(t,
        schemaOf("id" -> IntegerType, "name" -> Str, "age" -> IntegerType)("id"), Seq.empty)
      val id = freshId("bypass")
      registered(id -> src) {
        val db = runPipeline(s, Seq(id -> src), "EVOLVE",
          extraYaml =
            """transform:
              |  - source-table: another.irrelevant
              |    projection: "'irrelevant' AS tag"""".stripMargin) { drain =>
          scriptEvolveSnapshot(src, t)
          drain()
          src.appendDdl(AddColumnEvent(t, Seq(AddColumnEvent.ColumnWithPosition(
            "gender", CdcTypes.TinyIntT(), AddColumnEvent.After("age")))))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1012, "name" -> "Eve", "age" -> 17, "gender" -> 0.toByte)))
          drain()
          src.appendDdl(AlterColumnTypeEvent(t, Map("age" -> CdcTypes.DoubleT())))
          src.appendDdl(RenameColumnEvent(t, Map("age" -> "precise_age")))
          src.appendDdl(RenameColumnEvent(t, Map("gender" -> "biological_sex")))
          src.appendDdl(DropColumnEvent(t, Seq("biological_sex")))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1013, "name" -> "Fiona", "precise_age" -> 16.0)))
          drain()
          src.appendDdl(TruncateTableEvent(t))
          src.append(DataChangeEvent.insert(t,
            Map("id" -> 1014, "name" -> "Gem", "precise_age" -> 17.0)))
          drain()
          src.appendDdl(DropTableEvent(t))
        }
        requireEventSequence(db, t, bypassLines)
        eventLogDf(s, db, t)
      }
    }),

    // MysqlToKafkaE2eITCase.testSyncWholeDatabaseWithDebeziumJsonHasSchema
    // :275 (fixture expectedEvents/mysqlToKafka/debezium-json-with-schema
    // .txt): `debezium-json.include-schema.enabled: true` wraps every value
    // in the Kafka Connect `{"schema":…,"payload":…}` envelope — per-column
    // connect types, nullability, and the `name` column's DEFAULT 'flink'
    // in the schema block. The customers half of the fixture is asserted
    // BYTE-EXACT over the loopback wire ($databaseName → kafka_db); the
    // schema-less testSyncWholeDatabaseWithDebeziumJson:128 and
    // testSyncWholeDatabaseWithCanalJson:201 variants are pinned by
    // c_kafka_pipeline_sink / t_kafka_debezium / t_kafka_canal.
    "c_e2e_kafka_debezium_schema" -> ((s, _) => {
      import graft.sinks.{KafkaBrokerDouble, KafkaDataSink, KafkaWireConsumer}
      import graft.operators.Envelope
      import org.apache.spark.sql.functions._
      val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
      broker.start()
      try {
        val tid = TableId.parse("kafka_db.customers")
        val customersStruct = StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("name", StringType, nullable = false,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString(AddColumnEvent.DefaultKey, "flink").build()),
          StructField("address", StringType),
          StructField("phone_number", StringType)))
        val rows = (1 to 4).map(i => org.apache.spark.sql.Row(
          org.apache.spark.sql.Row(100 + i, s"user_$i", "Shanghai", "123567891234"),
          i.toLong))
        val data = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          StructType(Seq(
            StructField("payload", customersStruct),
            StructField("seqno", org.apache.spark.sql.types.LongType))))
        val env = data.select(
          lit(tid.identifier).as(Envelope.TableIdCol),
          lit("INSERT").as(Envelope.OpCol),
          lit(null).cast(customersStruct).as(Envelope.BeforeCol),
          col("payload").as(Envelope.AfterCol),
          col("seqno").as(Envelope.SeqCol),
          map().cast("map<string,string>").as(Envelope.MetaCol))
        val sink = new KafkaDataSink(broker.bootstrap, includeSchema = true)
        sink.applySchemaChange(CreateTableEvent(tid,
          TableSchema(customersStruct, Seq("id"))))
        sink.writeChangelog(tid, env, batchId = 0L, runId = "e2e-schema")
        val consumer = new KafkaWireConsumer(broker.bootstrap)
        val values =
          try consumer.readAllCommitted(tid.identifier, 0)
            .map(r => new String(r.value, java.nio.charset.StandardCharsets.UTF_8))
          finally consumer.close()
        // the fixture line, byte-exact modulo $databaseName and the row id
        val imageSchema =
          """{"type":"struct","fields":[{"type":"int32","optional":false,"field":"id"},""" +
            """{"type":"string","optional":false,"default":"flink","field":"name"},""" +
            """{"type":"string","optional":true,"field":"address"},""" +
            """{"type":"string","optional":true,"field":"phone_number"}]"""
        def expectedLine(i: Int): String =
          """{"schema":{"type":"struct","fields":[""" +
            imageSchema + ""","optional":true,"field":"before"},""" +
            imageSchema + ""","optional":true,"field":"after"}],"optional":false},""" +
            s""""payload":{"before":null,"after":{"id":${100 + i},"name":"user_$i",""" +
            """"address":"Shanghai","phone_number":"123567891234"},"op":"c",""" +
            """"source":{"db":"kafka_db","table":"customers"}}}"""
        val expected = (1 to 4).map(expectedLine)
        require(values.sorted == expected.sorted,
          s"with-schema wire values:\n  got ${values.sorted.headOption}\n  " +
            s"expected ${expected.sorted.headOption}")
        import s.implicits._
        values.sorted.zipWithIndex.map { case (v, i) => (i + 1, v) }
          .toDF("seq", "event").orderBy("seq")
      } finally broker.stop()
    }))

  // ---------------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------------

  private val defaultState =
    alphaState("TABLEALPHA") ++ betaState("TABLEBETA") ++
      gammaState("TABLEGAMMA") ++ deltaState("TABLEDELTA")

  private def snapState(tbl: String, rows: Seq[(Int, String)]) =
    rows.map { case (id, v) => (tbl, id, v) }

  private val mergedState: Seq[(String, Int, String)] = {
    def pad(v: String) = s"$v|null|null"
    (alphaRows.map { case (id, v) => ("ALL", id, pad(v)) } :+ ("ALL", 3007, pad("7"))) ++
      Seq(("ALL", 10001, "12|Derrida|null")) ++
      (betaRows.filterNot(_._1 == 2014).map { case (id, v) => ("ALL", id, pad(v)) } ++
        Seq(("ALL", 2014, pad("2014")), ("ALL", 10002, "null|null|15"))) ++
      (gammaRows.map { case (id, v) => ("ALL", id, pad(v)) } ++
        Seq(("ALL", 3019, pad("Emerald")), ("ALL", 10003, "null|null|Fluorite"))) ++
      (deltaRows.filterNot(_._1 == 4024).map { case (id, v) => ("ALL", id, pad(v)) } :+
        ("ALL", 10004, "null|null|null"))
  }

  private val alphabetState: Seq[(String, Int, String)] = {
    def pad(v: String) = s"$v|null|null"
    (alphaRows.map { case (id, v) => ("ALPHABET", id, pad(v)) } :+
      ("ALPHABET", 3007, pad("7"))) ++
      Seq(("ALPHABET", 10001, "12|Derrida|null")) ++
      betaRows.filterNot(_._1 == 2014).map { case (id, v) => ("ALPHABET", id, pad(v)) } ++
      Seq(("ALPHABET", 2014, pad("2014")), ("ALPHABET", 10002, "null|null|15"))
  }

  val oracles: Map[String, String] = Map(
    "c_e2e_route_default" -> valuesSql(defaultState),
    "c_e2e_route_default_batch" -> valuesSql(
      routeTables.flatMap(t => snapState(t._1, t._2))),
    "c_e2e_route_merge" -> valuesSql(mergedState),
    "c_e2e_route_merge_batch" -> valuesSql(
      routeTables.flatMap(t => snapState("ALL", t._2))),
    "c_e2e_route_partial" -> valuesSql(
      alphabetState ++ gammaState("TABLEGAMMA") ++ deltaState("TABLEDELTA")),
    "c_e2e_route_partial_batch" -> valuesSql(
      snapState("ALPHABET", alphaRows ++ betaRows) ++
        snapState("TABLEGAMMA", gammaRows) ++ snapState("TABLEDELTA", deltaRows)),
    "c_e2e_route_multiple" -> valuesSql(
      alphabetState ++ {
        (betaRows.filterNot(_._1 == 2014).map { case (id, v) =>
          ("BETAGAMM", id, s"$v|null") } ++
          Seq(("BETAGAMM", 2014, "2014|null"), ("BETAGAMM", 10002, "null|15")) ++
          gammaRows.map { case (id, v) => ("BETAGAMM", id, s"$v|null") } ++
          Seq(("BETAGAMM", 3019, "Emerald|null"), ("BETAGAMM", 10003, "null|Fluorite")))
      } ++ deltaState("TABLEDELTA")),
    "c_e2e_route_multiple_batch" -> valuesSql(
      snapState("ALPHABET", alphaRows ++ betaRows) ++
        snapState("BETAGAMM", betaRows ++ gammaRows) ++
        snapState("TABLEDELTA", deltaRows)),
    "c_e2e_route_one_to_many" -> valuesSql(
      Seq("TABLEA", "TABLEB", "TABLEC").flatMap(t =>
        alphaState(t)) ++ betaState("TABLEBETA") ++
        gammaState("TABLEGAMMA") ++ deltaState("TABLEDELTA")),
    "c_e2e_route_one_to_many_batch" -> valuesSql(
      Seq("TABLEA", "TABLEB", "TABLEC").flatMap(t => snapState(t, alphaRows)) ++
        snapState("TABLEBETA", betaRows) ++ snapState("TABLEGAMMA", gammaRows) ++
        snapState("TABLEDELTA", deltaRows)),
    "c_e2e_route_merge_transform" -> valuesSql(
      mergedState.map { case (t, id, v) =>
        // EXTRAS sits between VERSION and NAME in the transformed shape
        val parts = v.split("\\|", -1)
        (t, id, (Seq(parts(0), "extras") ++ parts.drop(1)).mkString("|"))
      }),
    "c_e2e_route_merge_transform_batch" -> valuesSql(
      routeTables.flatMap(t => t._2.map { case (id, v) => ("ALL", id, s"$v|extras") })),
    "c_e2e_route_replace_symbol" -> valuesSql(
      alphaState("NEW_TABLEALPHA") ++ betaState("NEW_TABLEBETA") ++
        gammaState("NEW_TABLEGAMMA") ++ deltaState("NEW_TABLEDELTA")),
    "c_e2e_route_replace_symbol_batch" -> valuesSql(
      routeTables.flatMap(t => snapState(s"NEW_${t._1}", t._2))),
    "c_e2e_route_extreme" -> valuesSql(
      (1 to 100).map(i => (s"TABLE$i", i, s"No.$i"))),
    "c_e2e_route_extreme_stream" -> valuesSql(
      (1 to 100).map(i => (s"TABLE$i", i, s"No.$i"))),
    "c_e2e_evolving_transform_evolve" -> eventValuesSql(etEvolveLines),
    "c_e2e_evolving_transform_merge" -> eventValuesSql(etMergeLines),
    "c_e2e_evolving_transform_evolve_error" ->
      "SELECT * FROM (VALUES ('EVOLVE', true)) AS t(behavior, faulted)",
    "c_e2e_evolving_transform_try_evolve_error" -> eventValuesSql(etDegradedLines),
    "c_e2e_evolving_transform_ignore" -> eventValuesSql(etDegradedLines),
    "c_e2e_evolving_transform_exception" ->
      "SELECT * FROM (VALUES ('EXCEPTION', true)) AS t(behavior, faulted)",
    "c_e2e_evolving_transform_lenient" -> eventValuesSql(etLenientLines),
    "c_e2e_evolving_transform_fine_grained" -> eventValuesSql(etFineGrainedLines),
    "c_e2e_unexpected_behavior" ->
      "SELECT * FROM (VALUES ('unexpected', true)) AS t(behavior, refused)",
    "c_e2e_transform_hetero" -> valuesSql(Seq(
      ("terminus", 1009, "100"), ("terminus", 1010, "10"), ("terminus", 1011, "11"),
      ("terminus", 2012, "12"), ("terminus", 2013, "13"), ("terminus", 2014, "14"),
      ("terminus", 3007, "7"))),
    "c_e2e_transform_hetero_batch" -> valuesSql(Seq(
      ("terminus", 1009, "8.1"), ("terminus", 1010, "10"), ("terminus", 1011, "11"),
      ("terminus", 2011, "11"), ("terminus", 2012, "12"), ("terminus", 2013, "13"),
      ("terminus", 2014, "14"))),
    "c_e2e_multiple_hitting" -> valuesSql(Seq(
      ("TABLEALPHA", 1008, "8|199|17|Alice|2008|8"),
      ("TABLEALPHA", 1009, "100|0|18|Bob|2009|100"),
      ("TABLEALPHA", 1010, "10|99|19|Carol|2010|10"),
      ("TABLEALPHA", 1011, "11|59|20|Dave|2011|11"),
      ("TABLEALPHA", 3007, "7|79|25|IINA|4007|7"),
      ("TABLEBETA", 2012, "12|Monterey|22|Fred|3012|12"),
      ("TABLEBETA", 2013, "13|Ventura|23|Gus|3013|13"),
      ("TABLEBETA", 2014, "14|Sonoma|24|Henry|3014|14"))),
    "c_e2e_multiple_hitting_batch" -> valuesSql(Seq(
      ("TABLEALPHA", 1008, "8|199|17|Alice|2008|8"),
      ("TABLEALPHA", 1009, "8.1|0|18|Bob|2009|8.1"),
      ("TABLEALPHA", 1010, "10|99|19|Carol|2010|10"),
      ("TABLEALPHA", 1011, "11|59|20|Dave|2011|11"),
      ("TABLEBETA", 2011, "11|Big Sur|21|Eva|3011|11"),
      ("TABLEBETA", 2012, "12|Monterey|22|Fred|3012|12"),
      ("TABLEBETA", 2013, "13|Ventura|23|Gus|3013|13"),
      ("TABLEBETA", 2014, "14|Sonoma|24|Henry|3014|14"))),
    "c_e2e_transform_cast" -> valuesSql(Seq(
      ("TABLEALPHA", 1008, "108.0|17 - Alice"),
      ("TABLEALPHA", 1009, "200.0|18 - Bob"),
      ("TABLEALPHA", 3007, "107.0|16 - IINA"),
      ("TABLEBETA", 2012, "112.0|22 - Fred"),
      ("TABLEBETA", 2013, "113.0|23 - Gus"),
      ("TABLEBETA", 2014, "114.0|24 - Henry"))),
    "c_e2e_transform_evolution" -> valuesSql(Seq(
      ("TABLEALPHA", 1009, "id -> 1009|0"),
      ("TABLEALPHA", 1010, "id -> 1010|99"),
      ("TABLEALPHA", 1011, "id -> 1011|59"),
      ("TABLEALPHA", 3007, "id -> 3007|79"),
      ("TABLEALPHA", 3008, "id -> 3008|80"),
      ("TABLEALPHA", 3009, "id -> 3009|90"),
      ("TABLEALPHA", 3010, "id -> 3010|10"))),
    "c_e2e_lenient_route" -> eventValuesSql(lenientRouteLines),
    "c_e2e_bypass_transform" -> eventValuesSql(bypassLines),
    "c_e2e_kafka_debezium_schema" -> eventValuesSql(kafkaSchemaLines))
}
