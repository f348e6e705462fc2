package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy DataStream-style fluent source builder, generalized over DB dialects.
  *
  * The reference exposes one builder per connector
  * (`flink-connector-mysql-cdc/.../MySqlSourceBuilder.java:57-290` and eight
  * siblings under `flink-cdc-connect/flink-cdc-source-connectors/`). Here a
  * single generic builder carries the shared incremental-snapshot knobs and a
  * [[CdcDialect]] plug-in supplies the per-database specifics (default port,
  * identifier quoting, chunk-split SQL) — SURVEY.md §2.1's "one generic
  * `readStream.format("cdc")` with dialect plug-ins".
  *
  * `build()` yields the validated option map; `load(spark)` wires it to the
  * `graft-cdc` DSv2 format (scripted/in-memory sources in this environment; a
  * real deployment points the same options at a live database).
  */
final case class CdcSourceBuilder(
    dialect: CdcDialect,
    hostname: String = "localhost",
    port: Int = -1,
    username: String = "",
    password: String = "",
    databaseList: Seq[String] = Seq.empty,
    tableList: Seq[String] = Seq.empty,
    serverId: Option[String] = None,
    serverTimeZone: String = "UTC",
    splitSize: Int = 8096,
    splitMetaGroupSize: Int = 1000,
    fetchSize: Int = 1024,
    connectTimeoutMs: Long = 30000L,
    connectMaxRetries: Int = 3,
    connectionPoolSize: Int = 20,
    distributionFactorUpper: Double = 1000.0,
    distributionFactorLower: Double = 0.05,
    startupOptions: StartupOptions = StartupOptions.initial,
    includeSchemaChanges: Boolean = false,
    closeIdleReaders: Boolean = false,
    skipSnapshotBackfill: Boolean = false,
    debeziumProperties: Map[String, String] = Map.empty,
    /** registry id of the backing [[graft.sources.cdc.ChangeSource]] — in this
      * environment the DSv2 provider reads scripted sources by id; a live
      * deployment's provider would instead connect with the dialect options.
      */
    sourceId: Option[String] = None) {

  def hostname(h: String): CdcSourceBuilder = copy(hostname = h)
  def port(p: Int): CdcSourceBuilder = copy(port = p)
  def username(u: String): CdcSourceBuilder = copy(username = u)
  def password(p: String): CdcSourceBuilder = copy(password = p)
  def databaseList(dbs: String*): CdcSourceBuilder = copy(databaseList = dbs)
  def tableList(tables: String*): CdcSourceBuilder = copy(tableList = tables)
  def serverId(id: String): CdcSourceBuilder = copy(serverId = Some(id))
  def serverTimeZone(tz: String): CdcSourceBuilder = copy(serverTimeZone = tz)
  def splitSize(n: Int): CdcSourceBuilder = copy(splitSize = n)
  def fetchSize(n: Int): CdcSourceBuilder = copy(fetchSize = n)
  def startupOptions(s: StartupOptions): CdcSourceBuilder = copy(startupOptions = s)
  def includeSchemaChanges(b: Boolean): CdcSourceBuilder = copy(includeSchemaChanges = b)
  def skipSnapshotBackfill(b: Boolean): CdcSourceBuilder = copy(skipSnapshotBackfill = b)
  def debeziumProperty(k: String, v: String): CdcSourceBuilder =
    copy(debeziumProperties = debeziumProperties + (k -> v))
  def sourceId(id: String): CdcSourceBuilder = copy(sourceId = Some(id))

  /** Validate and flatten to the option map of the `graft-cdc` format. */
  def build(): Map[String, String] = {
    require(tableList.nonEmpty, "tableList is required")
    require(splitSize > 1, s"splitSize must be > 1, got $splitSize")
    require(
      distributionFactorUpper >= 1.0 && distributionFactorLower <= 1.0 &&
        distributionFactorLower > 0,
      "distribution factor bounds must bracket 1.0")
    serverId.foreach(CdcSourceBuilder.validateServerId)
    val effectivePort = if (port > 0) port else dialect.defaultPort
    Map(
      "dialect" -> dialect.name,
      "hostname" -> hostname,
      "port" -> effectivePort.toString,
      "username" -> username,
      "password" -> password,
      "database.list" -> databaseList.mkString(","),
      "table.list" -> tableList.mkString(","),
      "server.time-zone" -> serverTimeZone,
      "chunk.size" -> splitSize.toString,
      "chunk.meta.group.size" -> splitMetaGroupSize.toString,
      "fetch.size" -> fetchSize.toString,
      "connect.timeout.ms" -> connectTimeoutMs.toString,
      "connect.max-retries" -> connectMaxRetries.toString,
      "connection.pool.size" -> connectionPoolSize.toString,
      "chunk-key.even-distribution.factor.upper-bound" -> distributionFactorUpper.toString,
      "chunk-key.even-distribution.factor.lower-bound" -> distributionFactorLower.toString,
      "startup.mode" -> startupOptions.mode,
      "include.schema.changes" -> includeSchemaChanges.toString,
      "scan.incremental.close-idle-reader.enabled" -> closeIdleReaders.toString,
      "backfill.skip" -> skipSnapshotBackfill.toString) ++
      serverId.map("server-id" -> _) ++
      sourceId.map("sourceId" -> _) ++
      startupOptions.specificOffset.map("startup.specific-offset" -> _.toString) ++
      startupOptions.timestampMillis.map("startup.timestamp" -> _.toString) ++
      debeziumProperties.map { case (k, v) => s"debezium.$k" -> v }
  }

  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream.format("graft.sources.cdc.GraftCdcProvider")
    build().foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Connect this builder to a LIVE database through
    * [[graft.sources.cdc.JdbcChangeSource]]: creates the capture tables,
    * registers the source, and returns the builder (sourceId bound) plus the
    * source handle — `load(spark)` then streams the real incremental-snapshot
    * protocol against SQL state. This is the end-to-end path a live dialect
    * deployment takes (Derby-tested; a binlog deployment substitutes a
    * Debezium-backed ChangeSource behind the same registry id).
    */
  def connectJdbc(
      jdbcUrl: String,
      schema: graft.core.TableSchema): (CdcSourceBuilder, graft.sources.cdc.JdbcChangeSource) = {
    require(tableList.size == 1, "the jdbc path streams a single table per source")
    val tid = graft.core.TableId.parse(tableList.head)
    val src = new graft.sources.cdc.JdbcChangeSource(jdbcUrl, tid, schema)
    src.initTables()
    val id = sourceId.getOrElse(
      s"jdbc-${dialect.name}-${tid.identifier}-${java.util.UUID.randomUUID()}")
    graft.sources.cdc.ChangeSourceRegistry.register(id, src)
    (copy(sourceId = Some(id)), src)
  }
}

object CdcSourceBuilder {
  def mysql: CdcSourceBuilder = CdcSourceBuilder(MySqlDialect)
  def postgres: CdcSourceBuilder = CdcSourceBuilder(PostgresDialect)
  def oracle: CdcSourceBuilder = CdcSourceBuilder(OracleDialect)
  def sqlserver: CdcSourceBuilder = CdcSourceBuilder(SqlServerDialect)
  def db2: CdcSourceBuilder = CdcSourceBuilder(Db2Dialect)
  def mongodb: CdcSourceBuilder = CdcSourceBuilder(MongoDialect)
  def oceanbase: CdcSourceBuilder = CdcSourceBuilder(OceanBaseDialect)
  def tidb: CdcSourceBuilder = CdcSourceBuilder(TiDbDialect)
  def vitess: CdcSourceBuilder = CdcSourceBuilder(VitessDialect)

  /** `server-id` accepts `N` or an `N-M` range ≥ the source parallelism
    * (`MySqlSourceBuilder.serverId` semantics).
    */
  private[sources] def validateServerId(s: String): Unit = {
    val P1 = """(\d+)""".r; val P2 = """(\d+)-(\d+)""".r
    s match {
      case P1(_) => ()
      case P2(lo, hi) =>
        require(lo.toLong <= hi.toLong, s"server-id range inverted: $s")
      case other => throw new IllegalArgumentException(s"bad server-id: $other")
    }
  }
}

/** Per-database plug-in: naming, quoting, and the SQL the chunk splitter and
  * watermark protocol issue. Mirrors the per-connector `JdbcDataSourceDialect`
  * implementations (`flink-cdc-base/.../relational/JdbcSourceChunkSplitter`
  * consumers) without a live connection.
  */
sealed trait CdcDialect {
  def name: String
  def defaultPort: Int
  /** identifier quoting (MySQL backticks vs ANSI double quotes). */
  def quote(id: String): String = "\"" + id + "\""
  /** log-offset field names exposed in envelope `meta` (binlog file/pos, LSN, SCN...). */
  def offsetFields: Seq[String]

  // --- chunk-splitter SQL (JdbcSourceChunkSplitter query shapes) ---
  def minMaxCountQuery(table: String, pk: String): String =
    s"SELECT MIN(${quote(pk)}), MAX(${quote(pk)}), COUNT(*) FROM $table"
  def chunkQuery(table: String, pk: String): String =
    s"SELECT * FROM $table WHERE ${quote(pk)} >= ? AND ${quote(pk)} <= ?"
  /** uneven path: MAX of the next `chunkSize` keys past the previous boundary. */
  def nextChunkMaxQuery(table: String, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (SELECT ${quote(pk)} FROM $table " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC LIMIT $chunkSize) T"
}

case object MySqlDialect extends CdcDialect {
  val name = "mysql"; val defaultPort = 3306
  override def quote(id: String): String = s"`$id`"
  val offsetFields = Seq("binlog_file", "binlog_pos", "gtid_set")
}
case object PostgresDialect extends CdcDialect {
  val name = "postgres"; val defaultPort = 5432
  val offsetFields = Seq("lsn")
}
case object OracleDialect extends CdcDialect {
  val name = "oracle"; val defaultPort = 1521
  val offsetFields = Seq("scn")
  override def nextChunkMaxQuery(table: String, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (SELECT ${quote(pk)} FROM $table " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC FETCH FIRST $chunkSize ROWS ONLY) T"
}
case object SqlServerDialect extends CdcDialect {
  val name = "sqlserver"; val defaultPort = 1433
  override def quote(id: String): String = s"[$id]"
  val offsetFields = Seq("change_lsn", "commit_lsn")
  override def nextChunkMaxQuery(table: String, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (SELECT TOP ($chunkSize) ${quote(pk)} FROM $table " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC) T"
}
case object Db2Dialect extends CdcDialect {
  val name = "db2"; val defaultPort = 50000
  val offsetFields = Seq("lsn")
  override def nextChunkMaxQuery(table: String, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (SELECT ${quote(pk)} FROM $table " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC FETCH FIRST $chunkSize ROWS ONLY) T"
}
case object MongoDialect extends CdcDialect {
  val name = "mongodb"; val defaultPort = 27017
  val offsetFields = Seq("resume_token", "cluster_time")
  // document store: chunking is by _id ranges, not SQL
  override def minMaxCountQuery(table: String, pk: String): String =
    s"""{"aggregate":"$table","pipeline":[{"$$group":{"_id":null,"min":{"$$min":"$$$pk"},"max":{"$$max":"$$$pk"},"count":{"$$sum":1}}}]}"""
  override def chunkQuery(table: String, pk: String): String =
    s"""{"find":"$table","filter":{"$pk":{"$$gte":"?","$$lte":"?"}}}"""
  override def nextChunkMaxQuery(table: String, pk: String, chunkSize: Int): String =
    s"""{"find":"$table","filter":{"$pk":{"$$gte":"?"}},"sort":{"$pk":1},"limit":$chunkSize}"""
}
case object OceanBaseDialect extends CdcDialect {
  val name = "oceanbase"; val defaultPort = 2881
  override def quote(id: String): String = s"`$id`"
  val offsetFields = Seq("commit_version")
}
case object TiDbDialect extends CdcDialect {
  val name = "tidb"; val defaultPort = 4000
  override def quote(id: String): String = s"`$id`"
  val offsetFields = Seq("ts")
}
case object VitessDialect extends CdcDialect {
  val name = "vitess"; val defaultPort = 15991
  override def quote(id: String): String = s"`$id`"
  val offsetFields = Seq("vgtid")
}

/** Startup position, mirroring `base/options/StartupOptions.java:38-94`. */
final case class StartupOptions private (
    mode: String,
    specificOffset: Option[Long] = None,
    timestampMillis: Option[Long] = None)

object StartupOptions {
  /** snapshot first, then stream from the snapshot's high watermark. */
  val initial: StartupOptions = StartupOptions("initial")
  /** bounded: snapshot only. */
  val snapshot: StartupOptions = StartupOptions("snapshot")
  /** stream from the earliest retained log position. */
  val earliest: StartupOptions = StartupOptions("earliest")
  /** stream from the current tail. */
  val latest: StartupOptions = StartupOptions("latest")
  /** stream from the last committed offset (falls back to `latest` semantics
    * when no committed offset exists, as the reference does).
    */
  val committed: StartupOptions = StartupOptions("committed")
  def specificOffset(offset: Long): StartupOptions =
    StartupOptions("specific-offset", specificOffset = Some(offset))
  def timestamp(epochMillis: Long): StartupOptions =
    StartupOptions("timestamp", timestampMillis = Some(epochMillis))
}
