package graft.sinks

import graft.pipeline.SinkDef
import org.apache.spark.sql.SparkSession

/** Sink registry: maps a YAML `sink.type` to a concrete [[DataSink]] — the
  * Spark form of the reference's `DataSinkFactory` SPI discovery
  * (`composer/.../FactoryDiscoveryUtils` over
  * `flink-cdc-pipeline-connectors/`).
  */
object DataSinks {

  def forDef(spark: SparkSession, sinkDef: SinkDef): DataSink =
    sinkDef.sinkType.toLowerCase match {
      case "values" | "memory" =>
        // `record.events: true` turns on the per-table unified DDL+data
        // event log (the ValuesDataSink outCaptor analog); `reject.ddl` is
        // the fine-grained failure-injection surface (comma-separated
        // schema-change kinds the sink refuses) — test scripts only
        new MemoryDatabase(
          recordEvents = sinkDef.config.get("record.events").exists(_.toBoolean),
          rejectDdl = sinkDef.config.get("reject.ddl")
            .map(_.split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSet)
            .getOrElse(Set.empty))
      case "oceanbase" if sinkDef.config.contains("username") =>
        // the DEDICATED OceanBase pipeline connector (the reference's
        // flink-cdc-pipeline-connector-oceanbase, required options url +
        // username + password): tenant-dialect catalog DDL + buffered
        // upsert/delete writer with memstore back-pressure over the MySQL
        // text wire. Without `username` the type stays the legacy
        // mysql-dialect JDBC alias below (OB's MySQL-compat JDBC mode).
        val raw = sinkDef.config.getOrElse("url",
          throw new IllegalArgumentException("oceanbase sink requires 'url'"))
        sinkDef.config.getOrElse("password",
          throw new IllegalArgumentException("oceanbase sink requires 'password'"))
        val hp = raw.replaceFirst("^jdbc:mysql://", "").replaceFirst("^jdbc:oceanbase://", "")
          .takeWhile(_ != '/')
        val (host, port) = hp.split(":") match {
          case Array(h, p) => (h, p.toInt)
          case Array(h) => (h, 2881)
          case _ => throw new IllegalArgumentException(s"malformed oceanbase url '$raw'")
        }
        new OceanBaseDataSink(
          host = host, port = port,
          username = sinkDef.config("username"),
          memstoreCheckEnabled =
            sinkDef.config.getOrElse("memstore-check.enabled", "true").toBoolean,
          memstoreThreshold =
            sinkDef.config.getOrElse("memstore-check.threshold", "0.9").toDouble,
          bufferSize = sinkDef.config.getOrElse("buffer-flush.buffer-size", "1024").toInt)
      case t @ ("jdbc" | "mysql" | "oceanbase" | "postgres") =>
        // oceanbase WITHOUT username stays the mysql-wire JDBC alias (OB's
        // MySQL-compat JDBC mode); mysql/postgres are the dialect-explicit
        // spellings of the jdbc type
        val dialectDefault = t match {
          case "mysql" | "oceanbase" => "mysql"
          case "postgres" => "postgres"
          case _ => "generic"
        }
        new JdbcUpsertSink(
          url = sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException(s"$t sink requires 'url'")),
          dialectName = sinkDef.config.getOrElse("dialect", dialectDefault),
          props = sinkDef.config.view
            .filterKeys(_.startsWith("driver.")).toMap
            .map { case (k, v) => k.stripPrefix("driver.") -> v },
          batchSize = sinkDef.config.getOrElse("batch.size", "1024").toInt)
      case "jdbc-exactly-once" =>
        // option surface validated FactoryHelper-style: required url, typed
        // optionals, `driver.*` passes through like the reference's
        // `validateExcept("debezium.")` namespaces
        graft.pipeline.FactoryOptions.validateExcept(
          "jdbc-exactly-once",
          required = Set(graft.pipeline.FactoryOptions.ConfigOpt(
            "url", graft.pipeline.FactoryOptions.StringType)),
          optional = Set(
            graft.pipeline.FactoryOptions.ConfigOpt(
              "dialect", graft.pipeline.FactoryOptions.StringType),
            graft.pipeline.FactoryOptions.ConfigOpt(
              "batch.size", graft.pipeline.FactoryOptions.IntType),
            graft.pipeline.FactoryOptions.ConfigOpt(
              "append-only", graft.pipeline.FactoryOptions.BooleanType)),
          config = sinkDef.config,
          "driver.")
        new JdbcTwoPhaseSink(
          url = sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException("jdbc-exactly-once sink requires 'url'")),
          dialectName = sinkDef.config.getOrElse("dialect", "generic"),
          props = sinkDef.config.view
            .filterKeys(_.startsWith("driver.")).toMap
            .map { case (k, v) => k.stripPrefix("driver.") -> v },
          batchSize = sinkDef.config.getOrElse("batch.size", "1024").toInt,
          appendOnly = sinkDef.config.getOrElse("append-only", "false").toBoolean)
      case "parquet" =>
        new ParquetMergeSink(
          spark,
          rootDir = sinkDef.config.getOrElse(
            "path", throw new IllegalArgumentException("parquet sink requires 'path'")),
          buckets = sinkDef.config.getOrElse("buckets", "16").toInt)
      case t @ ("delta" | "iceberg" | "paimon") =>
        // the reference's lakehouse pipeline connectors (`iceberg`,
        // `paimon`) as open wire formats: CDC merges into an internal
        // lakehouse staging table, mirrored per batch into a directory any
        // external Delta/Iceberg/Paimon reader opens
        new MirroredLakehouseSink(
          spark,
          rootDir = sinkDef.config.getOrElse(
            "path", throw new IllegalArgumentException(s"$t sink requires 'path'")),
          format = t,
          buckets = sinkDef.config.getOrElse("buckets", "16").toInt,
          mergeEngine = sinkDef.config.getOrElse("merge-engine", "last-wins"),
          checkpointEvery = sinkDef.config.getOrElse("checkpoint.every", "0").toInt,
          snapshotsKeep = sinkDef.config.getOrElse("snapshots.keep", "0").toInt,
          fullCompactionEvery = sinkDef.config.getOrElse(
            "full-compaction.delta-commits", "0").toInt)
      case "lakehouse" =>
        new LakehouseSink(
          spark,
          rootDir = sinkDef.config.getOrElse(
            "path", throw new IllegalArgumentException("lakehouse sink requires 'path'")),
          buckets = sinkDef.config.getOrElse("buckets", "16").toInt,
          collectStats = sinkDef.config.getOrElse("stats", "true").toBoolean,
          changelog = sinkDef.config.getOrElse("changelog", "false").toBoolean,
          mergeEngine = sinkDef.config.getOrElse("merge-engine", "last-wins"))
      case "elasticsearch" =>
        new ElasticsearchSink(
          baseUrl = sinkDef.config.getOrElse("hosts", sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException("elasticsearch sink requires 'hosts'"))),
          maxActions = sinkDef.config.getOrElse("batch.size.max", "500").toInt)
      case "fluss" =>
        new FlussSink(
          baseUrl = sinkDef.config.getOrElse("bootstrap.servers",
            sinkDef.config.getOrElse("url", throw new IllegalArgumentException(
              "fluss sink requires 'bootstrap.servers'"))),
          database = sinkDef.config.getOrElse("database", "fluss"),
          buckets = sinkDef.config.getOrElse("bucket.num", "4").toInt)
      case "maxcompute" =>
        new MaxComputeSink(
          baseUrl = sinkDef.config.getOrElse("tunnel.endpoint",
            sinkDef.config.getOrElse("url", throw new IllegalArgumentException(
              "maxcompute sink requires 'tunnel.endpoint'"))),
          project = sinkDef.config.getOrElse("project", "graft"),
          buckets = sinkDef.config.getOrElse("buckets.num", "8").toInt)
      case "kafka" =>
        // the reference's most-used streaming sink
        // (`flink-cdc-pipeline-connector-kafka/.../KafkaDataSinkOptions.java`):
        // value.format debezium-json|canal-json, key.format json|csv,
        // partition.strategy ALL_TO_ZERO|HASH_BY_KEY, a global `topic`
        // override, and `sink.tableId-to-topic.mapping` "selector:topic;…"
        new KafkaDataSink(
          bootstrap = sinkDef.config.getOrElse("properties.bootstrap.servers",
            sinkDef.config.getOrElse("bootstrap.servers",
              sinkDef.config.getOrElse("url", throw new IllegalArgumentException(
                "kafka sink requires 'properties.bootstrap.servers'")))),
          valueFormat = sinkDef.config.getOrElse("value.format", "debezium-json"),
          keyFormat = sinkDef.config.getOrElse("key.format", "json"),
          partitionStrategy = sinkDef.config.getOrElse("partition.strategy", "ALL_TO_ZERO"),
          topicOverride = sinkDef.config.get("topic"),
          topicMapping = sinkDef.config.get("sink.tableId-to-topic.mapping")
            .map(_.split(";").toSeq.filter(_.nonEmpty).map { m =>
              val i = m.lastIndexOf(':')
              require(i > 0, s"malformed tableId-to-topic mapping entry '$m'")
              (m.substring(0, i), m.substring(i + 1))
            }).getOrElse(Seq.empty),
          addTableIdHeaders = sinkDef.config
            .getOrElse("sink.add-tableId-to-header-enabled", "false").toBoolean,
          customHeaders = sinkDef.config.get("sink.custom-header")
            .map(_.split(",").toSeq.filter(_.nonEmpty).map { h =>
              val i = h.indexOf(':')
              require(i > 0, s"malformed custom header '$h' (want key:value)")
              (h.substring(0, i).trim, h.substring(i + 1).trim)
            }).getOrElse(Seq.empty),
          deliveryGuarantee =
            sinkDef.config.getOrElse("sink.delivery-guarantee", "at-least-once"),
          transactionalIdPrefix =
            sinkDef.config.getOrElse("sink.transactional-id-prefix", "graft-cdc"),
          compressionType = sinkDef.config.getOrElse(
            "properties.compression.type",
            sinkDef.config.getOrElse("compression.type", "none")),
          includeSchema = sinkDef.config
            .get("debezium-json.include-schema.enabled").exists(_.toBoolean))
      case "starrocks" =>
        new StarRocksSink(
          baseUrl = sinkDef.config.getOrElse("load-url", sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException("starrocks sink requires 'load-url'"))),
          maxRows = sinkDef.config.getOrElse("sink.buffer-flush.max-rows", "1000").toInt)
      case "doris" =>
        new DorisSink(
          baseUrl = sinkDef.config.getOrElse("fenodes", sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException("doris sink requires 'fenodes'"))),
          maxRows = sinkDef.config.getOrElse("sink.buffer-flush.max-rows", "1000").toInt,
          // the reference reads this from table config (DorisSchemaUtils
          // .getPartitionInfo); null partition values then fill with defaults
          partitionKey = sinkDef.config.get("table.create.partition-key"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown sink type '$other' (supported: values, jdbc, mysql, postgres, " +
            "oceanbase, jdbc-exactly-once, parquet, lakehouse, paimon, delta, " +
            "iceberg, kafka, elasticsearch, starrocks, doris, maxcompute, fluss)")
    }
}
