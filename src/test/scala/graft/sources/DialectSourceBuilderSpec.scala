package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DialectSourceBuilderSpec extends AnyFunSuite {

  test("builder flattens to validated options with dialect defaults") {
    val opts = CdcSourceBuilder.mysql
      .hostname("db1").username("u").password("p")
      .databaseList("app").tableList("app.orders", "app.users")
      .serverId("5400-5404")
      .splitSize(4096)
      .startupOptions(StartupOptions.timestamp(1700000000000L))
      .debeziumProperty("snapshot.locking.mode", "none")
      .build()
    assert(opts("dialect") == "mysql")
    assert(opts("port") == "3306") // dialect default applied
    assert(opts("table.list") == "app.orders,app.users")
    assert(opts("chunk.size") == "4096")
    assert(opts("startup.mode") == "timestamp")
    assert(opts("startup.timestamp") == "1700000000000")
    assert(opts("server-id") == "5400-5404")
    assert(opts("debezium.snapshot.locking.mode") == "none")
  }

  test("all nine dialects exist with distinct ports and offset vocabularies") {
    val all = Seq(
      MySqlDialect, PostgresDialect, OracleDialect, SqlServerDialect, Db2Dialect,
      MongoDialect, OceanBaseDialect, TiDbDialect, VitessDialect)
    assert(all.map(_.name).distinct.size == 9)
    assert(all.map(_.defaultPort).distinct.size == 9)
    all.foreach(d => assert(d.offsetFields.nonEmpty))
  }

  test("quoting differs by dialect and reaches chunk-split SQL") {
    assert(MySqlDialect.chunkQuery("t", "id").contains("`id`"))
    assert(PostgresDialect.chunkQuery("t", "id").contains("\"id\""))
    assert(SqlServerDialect.nextChunkMaxQuery("t", "id", 10).contains("TOP (10)"))
    assert(OracleDialect.nextChunkMaxQuery("t", "id", 10).contains("FETCH FIRST 10 ROWS"))
    assert(MySqlDialect.nextChunkMaxQuery("t", "id", 10).contains("LIMIT 10"))
    assert(MongoDialect.chunkQuery("c", "_id").startsWith("{")) // document query, not SQL
  }

  test("validation: missing tables, bad split size, inverted server-id range") {
    intercept[IllegalArgumentException](CdcSourceBuilder.mysql.build())
    intercept[IllegalArgumentException](
      CdcSourceBuilder.mysql.tableList("t").splitSize(1).build())
    intercept[IllegalArgumentException](
      CdcSourceBuilder.mysql.tableList("t").serverId("10-5").build())
    intercept[IllegalArgumentException](
      CdcSourceBuilder.mysql.tableList("t").serverId("abc").build())
  }

  test("load() wires the option map to a running DSv2 stream") {
    import graft.SparkTestBase
    import graft.core._
    import graft.sources.cdc._
    import org.apache.spark.sql.types._
    val spark = SparkTestBase.spark
    val t = TableId.parse("app.users")
    val schema = TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("id"))
    val src = new ScriptedChangeSource(
      t, schema, (1L to 3L).map(i => Map[String, Any]("id" -> i, "v" -> s"v$i")))
    ChangeSourceRegistry.register("builder-load", src)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = CdcSourceBuilder.mysql
        .tableList("app.users")
        .splitSize(2)
        .sourceId("builder-load")
        .load(spark)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= b.collect(); ()
        }
        .start()
      q.processAllAvailable(); q.stop()
      assert(buf.map(_.getStruct(3).getLong(0)).sorted == Seq(1L, 2L, 3L))
    } finally ChangeSourceRegistry.remove("builder-load")
  }

  test("connectJdbc: builder -> live Derby -> DSv2 stream end-to-end") {
    import graft.core._
    import org.apache.spark.sql.types._
    val spark = graft.SparkTestBase.spark
    val schema = TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("id"))
    val db = java.nio.file.Files.createTempDirectory("derby-builder").resolve("db")
    val (builder, src) = CdcSourceBuilder.postgres // ANSI quoting path
      .tableList("app.bldr")
      .splitSize(4)
      .connectJdbc(s"jdbc:derby:$db;create=true", schema)
    try {
      val t = TableId.parse("app.bldr")
      (1L to 10L).foreach(i =>
        src.applyEvent(DataChangeEvent.insert(t, Map("id" -> i, "v" -> s"v$i"))))
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = builder.load(spark).writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= b.collect(); ()
        }
        .start()
      q.processAllAvailable()
      src.applyEvent(DataChangeEvent.update(t, Map("id" -> 1L), Map("id" -> 1L, "v" -> "x")))
      q.processAllAvailable()
      q.stop()
      assert(buf.count(_.getString(1) == "INSERT") == 10)
      assert(buf.exists(r => r.getString(1) == "UPDATE" && r.getStruct(3).getString(1) == "x"))
    } finally builder.sourceId.foreach(graft.sources.cdc.ChangeSourceRegistry.remove)
  }

  test("startup options mirror StartupOptions.java factory surface") {
    assert(StartupOptions.initial.mode == "initial")
    assert(StartupOptions.snapshot.mode == "snapshot")
    assert(StartupOptions.earliest.mode == "earliest")
    assert(StartupOptions.latest.mode == "latest")
    assert(StartupOptions.committed.mode == "committed")
    assert(StartupOptions.specificOffset(42L).specificOffset.contains(42L))
    assert(StartupOptions.timestamp(7L).timestampMillis.contains(7L))
  }
}
