package graft.pipeline

import graft.SparkTestBase
import graft.core._
import graft.operators.Envelope
import graft.sinks.DataSinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** YAML definition → sink factory → composed pipeline → concrete sink,
  * end-to-end (the `FlinkPipelineComposer` IT shape with a real writer).
  */
class YamlToSinkSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def runPipeline(sinkYaml: String): (PipelineComposer, graft.sinks.DataSink) = {
    val yaml =
      s"""source:
         |  type: values
         |sink:
         |$sinkYaml
         |transform:
         |  - source-table: app.\\.*
         |    projection: "*, UPPER(name) AS uname"
         |pipeline:
         |  name: yaml-to-sink
         |""".stripMargin
    val pdef = YamlPipelineParser.parse(yaml)
    val sink = DataSinks.forDef(spark, pdef.sink)
    val composer = new PipelineComposer(pdef, sink)
    val t = TableId.of("app", "users")
    val schema = TableSchema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType))),
      primaryKeys = Seq("id"))
    composer.createTables(Map(t -> schema))
    val env = Envelope.fromSnapshot(
      Seq((1L, "ann"), (2L, "bob")).toDF("id", "name"), t, col("id"))
    composer.processBatch(t, env)
    (composer, sink)
  }

  test("hetero-schema transform: wildcard + metadata-derived computed cols + filter-on-computed") {
    // mirrors FlinkPipelineTransformITCase.testHeteroSchemaTransform: two
    // differently-shaped tables, per-table rules with wildcard expansion,
    // a computed column built from a METADATA column, a filter that
    // references a COMPUTED column, merged into one routed sink table
    val yaml =
      """source:
        |  type: values
        |sink:
        |  type: values
        |route:
        |  - source-table: app.\.*
        |    sink-table: ods.merged
        |transform:
        |  - source-table: app.t1
        |    projection: "*, __table_name__ AS src, id * 2 AS twice"
        |    filter: "twice >= 4"
        |  - source-table: app.t2
        |    projection: "*, __table_name__ AS src, id * 10 AS twice"
        |pipeline:
        |  name: hetero
        |""".stripMargin
    val pdef = YamlPipelineParser.parse(yaml)
    val sink = DataSinks.forDef(spark, pdef.sink).asInstanceOf[graft.sinks.MemoryDatabase]
    val composer = new PipelineComposer(pdef, sink)
    import org.apache.spark.sql.types._
    val t1 = TableId.of("app", "t1"); val t2 = TableId.of("app", "t2")
    val s1 = TableSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", StringType))), primaryKeys = Seq("id"))
    val s2 = TableSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("b", DoubleType))), primaryKeys = Seq("id"))
    composer.createTables(Map(t1 -> s1, t2 -> s2))
    val merged = sink.schemaOf(TableId.parse("ods.merged")).get
    assert(merged.columnNames == Seq("id", "a", "src", "twice", "b"))

    composer.processBatch(t1, Envelope.fromSnapshot(
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "a"), t1, col("id")))
    composer.processBatch(t2, Envelope.fromSnapshot(
      Seq((10L, 0.5)).toDF("id", "b"), t2, col("id")))

    // t1 id=1 fails the filter (twice=2 < 4); metadata column resolves per table
    val rows = sink.rowsOf(TableId.parse("ods.merged")).map(_.mkString(",")).sorted
    assert(rows == Seq("10,null,t2,100,0.5", "2,y,t1,4,null", "3,z,t1,6,null"))
  }

  test("yaml 'parquet' sink: composed pipeline writes through ParquetMergeSink") {
    val dir = java.nio.file.Files.createTempDirectory("yamlsink").toString
    val (_, sink) = runPipeline(
      s"""  type: parquet
         |  path: $dir
         |  buckets: 2""".stripMargin)
    val pq = sink.asInstanceOf[graft.sinks.ParquetMergeSink]
    val rows = pq.read(TableId.of("app", "users")).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
  }

  test("yaml 'jdbc' sink: composed pipeline writes through Derby") {
    val db = s"memory:yaml${System.nanoTime()};create=true"
    runPipeline(
      s"""  type: jdbc
         |  url: jdbc:derby:$db""".stripMargin)
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db")
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT id, name, uname FROM app_users ORDER BY id")
      val buf = Seq.newBuilder[(Long, String, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getString(3)))
      assert(buf.result() == Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
    } finally conn.close()
  }

  test("yaml 'jdbc-exactly-once' sink: composed pipeline promotes via 2PC staging") {
    val db = s"memory:yaml2pc${System.nanoTime()};create=true"
    runPipeline(
      s"""  type: jdbc-exactly-once
         |  url: jdbc:derby:$db""".stripMargin)
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db")
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT id, name, uname FROM app_users ORDER BY id")
      val buf = Seq.newBuilder[(Long, String, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getString(3)))
      assert(buf.result() == Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
      // promote drained the staging mirror
      val st = conn.createStatement().executeQuery("SELECT count(*) FROM app_users_STAGE")
      st.next(); assert(st.getInt(1) == 0)
    } finally conn.close()
  }

  test("yaml 'lakehouse' sink: composed pipeline commits through the table format") {
    val dir = java.nio.file.Files.createTempDirectory("yamllake").toString
    val (_, sink) = runPipeline(
      s"""  type: lakehouse
         |  path: $dir
         |  buckets: 2""".stripMargin)
    val lake = sink.asInstanceOf[graft.sinks.LakehouseSink]
    val rows = lake.table(TableId.of("app", "users")).read().orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
    // the write went through the commit log, not a bare directory
    assert(lake.table(TableId.of("app", "users")).latestVersion() >= 1L)
  }

  test("yaml 'starrocks' sink: composed pipeline stream-loads to the loopback") {
    val server = new graft.sinks.MockStreamLoadServer(Seq("id"))
    try {
      runPipeline(
        s"""  type: starrocks
           |  load-url: ${server.url()}""".stripMargin)
      val docs = server.docsOf("app", "users").toMap
      assert(docs.keySet == Set("1", "2"))
      assert(docs("1").contains(""""uname":"ANN""""))
    } finally server.stop()
  }

  test("yaml 'iceberg' sink: composed pipeline mirrors to an Iceberg v2 table") {
    val dir = java.nio.file.Files.createTempDirectory("yamliceberg").toString
    val (_, sink) = runPipeline(
      s"""  type: iceberg
         |  path: $dir
         |  buckets: 2""".stripMargin)
    val m = sink.asInstanceOf[graft.sinks.MirroredLakehouseSink]
    val mdir = m.mirrorDir(TableId.of("app", "users"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(mdir, "metadata", "version-hint.text")))
    val back = graft.sinks.IcebergInterchange.importIceberg(spark, mdir)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
  }

  test("yaml 'delta' sink: composed pipeline mirrors to a _delta_log table") {
    val dir = java.nio.file.Files.createTempDirectory("yamldelta").toString
    val (_, sink) = runPipeline(
      s"""  type: delta
         |  path: $dir""".stripMargin)
    val m = sink.asInstanceOf[graft.sinks.MirroredLakehouseSink]
    val mdir = m.mirrorDir(TableId.of("app", "users"))
    val back = graft.sinks.DeltaInterchange.importDelta(spark, mdir)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
  }

  test("yaml 'paimon' sink: composed pipeline mirrors to a real Paimon table") {
    val dir = java.nio.file.Files.createTempDirectory("yamlpaimon").toString
    val (_, sink) = runPipeline(
      s"""  type: paimon
         |  path: $dir
         |  buckets: 2""".stripMargin)
    val m = sink.asInstanceOf[graft.sinks.MirroredLakehouseSink]
    val mdir = m.mirrorDir(TableId.of("app", "users"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(mdir, "snapshot", "LATEST")),
      "the external directory is a Paimon table, not the internal format")
    val back = graft.sinks.PaimonInterchange.importPaimon(spark, mdir)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
  }

  test("yaml 'maxcompute' sink: composed pipeline writes through tunnel sessions") {
    val server = new graft.sinks.MockTunnelServer
    try {
      runPipeline(
        s"""  type: maxcompute
           |  tunnel.endpoint: ${server.url()}
           |  project: graft""".stripMargin)
      val rows = server.rowsOf("graft", "users").toMap
      assert(rows.keySet == Set("1", "2"))
      assert(rows("1").contains(""""uname":"ANN""""))
    } finally server.stop()
  }

  test("yaml 'fluss' sink: composed pipeline upserts through the async writer") {
    val server = new graft.sinks.MockFlussServer
    try {
      runPipeline(
        s"""  type: fluss
           |  bootstrap.servers: ${server.url()}""".stripMargin)
      val rows = server.rowsOf("fluss", "users").toMap
      assert(rows.keySet == Set("1", "2"))
      assert(rows("2").contains(""""uname":"BOB""""))
    } finally server.stop()
  }

  test("yaml 'kafka' sink: composed pipeline produces debezium-json over the wire") {
    val broker = new graft.sinks.KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      runPipeline(
        s"""  type: kafka
           |  properties.bootstrap.servers: ${broker.bootstrap}""".stripMargin)
      // the composer hands the ENVELOPE to the ChangelogSink: both
      // transformed INSERTs reach the topic as their own records
      val c = new graft.sinks.KafkaWireConsumer(broker.bootstrap)
      val values = c.readAll("app.users", 0)
        .map(r => new String(r.value, java.nio.charset.StandardCharsets.UTF_8))
      c.close()
      assert(values.size == 2)
      assert(values.forall(_.contains("\"op\":\"c\"")))
      assert(values.exists(v => v.contains(""""uname":"ANN"""")))
      assert(values.forall(_.contains(""""table":"users"""")))
    } finally broker.stop()
  }

  test("yaml 'kafka' SOURCE: topic tail through the composed pipeline, group offsets committed") {
    val broker = new graft.sinks.KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val p = new graft.sinks.KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.users")
      def rec(i: Int, v: String) = (null.asInstanceOf[Array[Byte]],
        s"""{"before":null,"after":{"id":$i,"name":"$v"},"op":"c"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), i.toLong)
      p.produce("app.users", 0, Seq(rec(1, "ann"), rec(2, "bob")))
      val ckpt = java.nio.file.Files.createTempDirectory("kafka_src_yaml").toString
      val yaml =
        s"""source:
           |  type: kafka
           |  properties.bootstrap.servers: ${broker.bootstrap}
           |  properties.group.id: g-yaml
           |  topic: app.users
           |  table: app.users
           |  schema: "id BIGINT, name STRING"
           |  primary-key: id
           |  startup.mode: earliest
           |sink:
           |  type: values
           |pipeline:
           |  name: kafka-src
           |  checkpoint.dir: $ckpt
           |""".stripMargin
      try {
        val runner = new PipelineRunner(YamlPipelineParser.parse(yaml))
        runner.runHandlingDdl()
        val sink = runner.sink.asInstanceOf[graft.sinks.MemoryDatabase]
        assert(sink.rowsOf(TableId.parse("app.users")).map(_(1)).toSet == Set("ann", "bob"))
        // group offsets carry the DURABLE checkpoint position, which Spark
        // feeds back at the NEXT trigger (commitSources on cleanup) — the
        // same one-trigger trail as a Postgres slot's confirmed_flush_lsn:
        // pass 1's batch is not yet acknowledged when the query stops...
        val c = new graft.sinks.KafkaWireConsumer(broker.bootstrap)
        assert(c.committedOffset("g-yaml", "app.users", 0).isEmpty)
        p.produce("app.users", 0, Seq(rec(3, "cam")))
        runner.runHandlingDdl()
        assert(sink.rowsOf(TableId.parse("app.users")).map(_(1)).toSet ==
          Set("ann", "bob", "cam"))
        // ...pass 2 restores the checkpoint and acknowledges pass 1 (offset 2)
        assert(c.committedOffset("g-yaml", "app.users", 0).contains(2L))
        // each subsequent data batch acknowledges its predecessor
        p.produce("app.users", 0, Seq(rec(4, "dee")))
        runner.runHandlingDdl()
        assert(c.committedOffset("g-yaml", "app.users", 0).contains(3L))
        c.close()
      } finally graft.sources.cdc.ChangeSourceRegistry.remove("kafka:app.users/0")
      p.close()
    } finally broker.stop()
  }

  test("yaml 'kafka' SOURCE with partition: all drains every partition of the topic") {
    val broker = new graft.sinks.KafkaBrokerDouble(autoCreatePartitions = 2)
    broker.start()
    try {
      val p = new graft.sinks.KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.multi")
      def rec(i: Int, v: String) = (null.asInstanceOf[Array[Byte]],
        s"""{"before":null,"after":{"id":$i,"name":"$v"},"op":"c"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), i.toLong)
      // a keyed topic puts each key in ONE partition; model that directly
      p.produce("app.multi", 0, Seq(rec(1, "ann"), rec(3, "cam")))
      p.produce("app.multi", 1, Seq(rec(2, "bob"), rec(4, "dee")))
      val ckpt = java.nio.file.Files.createTempDirectory("kafka_all_yaml").toString
      val yaml =
        s"""source:
           |  type: kafka
           |  properties.bootstrap.servers: ${broker.bootstrap}
           |  topic: app.multi
           |  partition: all
           |  table: app.multi
           |  schema: "id BIGINT, name STRING"
           |  primary-key: id
           |  startup.mode: earliest
           |sink:
           |  type: values
           |pipeline:
           |  name: kafka-all
           |  checkpoint.dir: $ckpt
           |""".stripMargin
      try {
        val runner = new PipelineRunner(YamlPipelineParser.parse(yaml))
        // run() is single-stream by contract: multi-partition must refuse
        intercept[IllegalArgumentException](runner.run())
        runner.runHandlingDdl()
        val sink = runner.sink.asInstanceOf[graft.sinks.MemoryDatabase]
        assert(sink.rowsOf(TableId.parse("app.multi")).map(r => (r(0), r(1))).toSet ==
          Set((1L, "ann"), (2L, "bob"), (3L, "cam"), (4L, "dee")))
        // a second pass after new data in BOTH partitions resumes each
        // partition's own checkpoint (no re-read, no loss)
        p.produce("app.multi", 0, Seq(rec(5, "eve")))
        p.produce("app.multi", 1, Seq(rec(6, "fox")))
        runner.runHandlingDdl()
        assert(sink.rowsOf(TableId.parse("app.multi")).size == 6)
      } finally {
        graft.sources.cdc.ChangeSourceRegistry.remove("kafka:app.multi/0")
        graft.sources.cdc.ChangeSourceRegistry.remove("kafka:app.multi/1")
      }
      p.close()
    } finally broker.stop()
  }

  test("dialect-aliased jdbc sink types resolve (oceanbase speaks mysql wire)") {
    Seq("mysql", "oceanbase", "postgres").foreach { t =>
      val sink = DataSinks.forDef(spark, SinkDef(t, None, Map("url" -> "jdbc:none")))
      assert(sink.isInstanceOf[graft.sinks.JdbcUpsertSink], t)
    }
  }

  test("unknown sink type is rejected") {
    intercept[IllegalArgumentException](
      DataSinks.forDef(spark, SinkDef("iceberg-rest", None, Map.empty)))
  }

  test("PipelineRunner: YAML text to running pipeline in one call") {
    import graft.sources.cdc._
    import org.apache.spark.sql.types._
    val t = TableId.parse("app.users")
    val schema = TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType))),
      primaryKeys = Seq("id"))
    val src = new ScriptedChangeSource(
      t, schema, Seq(Map[String, Any]("id" -> 1L, "name" -> "ann"),
        Map[String, Any]("id" -> 2L, "name" -> "bob")))
    ChangeSourceRegistry.register("runner-e2e", src)
    try {
      val dir = java.nio.file.Files.createTempDirectory("runner").toString
      val yaml =
        s"""source:
           |  type: cdc
           |  sourceId: runner-e2e
           |  chunk.size: 1
           |sink:
           |  type: parquet
           |  path: $dir
           |transform:
           |  - source-table: app.\\.*
           |    projection: "*, UPPER(name) AS uname"
           |route:
           |  - source-table: app.users
           |    sink-table: app.users_out
           |pipeline:
           |  name: runner-e2e
           |""".stripMargin
      val (runner, q) = PipelineRunner.run(yaml)
      q.processAllAvailable(); q.stop()
      val out = runner.sink.asInstanceOf[graft.sinks.ParquetMergeSink]
        .read(TableId.parse("app.users_out")).orderBy("id").collect()
      assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
        Seq((1L, "ann", "ANN"), (2L, "bob", "BOB")))
    } finally ChangeSourceRegistry.remove("runner-e2e")
  }

  test("dialect source.type aliases: a SQL Server change-table source runs a YAML pipeline e2e") {
    import graft.sources.cdc.ChangeSourceRegistry
    import org.apache.spark.sql.types._
    val t = TableId.of("dbo", "users")
    val schema = TableSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))), primaryKeys = Seq("id"))
    val src = new graft.sources.sqlserver.SqlServerChangeSource(
      t, schema, Seq(Map[String, Any]("id" -> 1L, "name" -> "ann"),
        Map[String, Any]("id" -> 2L, "name" -> "bob")))
    ChangeSourceRegistry.register("sqlserver-e2e", src)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("sqlserver_e2e").toString
      val yaml =
        s"""source:
           |  type: sqlserver
           |  sourceId: sqlserver-e2e
           |sink:
           |  type: values
           |transform:
           |  - source-table: dbo.\\.*
           |    projection: "*, UPPER(name) AS uname"
           |pipeline:
           |  name: sqlserver-e2e
           |  checkpoint.dir: $ckpt
           |""".stripMargin
      val runner = new PipelineRunner(YamlPipelineParser.parse(yaml))
      runner.runHandlingDdl() // snapshot drain (AvailableNow per pass)
      val sink = runner.sink.asInstanceOf[graft.sinks.MemoryDatabase]
      assert(sink.rowsOf(t).map(_(1)).toSet == Set("ann", "bob"))
      // committed but UNCAPTURED: the next poll pass must not see it
      src.commitTx(Seq(DataChangeEvent.update(
        t, Map("id" -> 2L), Map("id" -> 2L, "name" -> "beth"))))
      runner.runHandlingDdl()
      assert(sink.rowsOf(t).map(_(1)).toSet == Set("ann", "bob"),
        "capture lag must hold through the YAML pipeline")
      src.runCaptureJob()
      runner.runHandlingDdl()
      assert(sink.rowsOf(t).map(r => (r(0), r(1), r(2))).toSet ==
        Set((1L, "ann", "ANN"), (2L, "beth", "BETH")))
    } finally ChangeSourceRegistry.remove("sqlserver-e2e")
  }
}
