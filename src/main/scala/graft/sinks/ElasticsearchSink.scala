package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets

/** Elasticsearch pipeline sink, mirroring the reference's
  * `flink-cdc-pipeline-connector-elasticsearch/.../serializer/ElasticsearchEventSerializer.java`
  * semantic contract over the public `/_bulk` NDJSON wire protocol:
  *
  *  - document `_id` = primary-key values joined with `_`
  *    (`ElasticsearchEventSerializer.generateUniqueId` + `joining("_")`);
  *  - `_index` = table id, optionally suffixed `<sep><shardingValue>` from a
  *    per-table sharding key or the first partition key
  *    (`tableSharding`, separator default `_`);
  *  - INSERT/REPLACE/UPDATE → an `index` operation carrying the after image;
  *    DELETE → a `delete` operation addressed at the UNsharded table index
  *    (the reference's own asymmetry — `createBulkOperationVariant`'s DELETE
  *    branch ignores sharding);
  *  - DATE renders `yyyy-MM-dd`, timestamps `yyyy-MM-dd HH:mm:ss.SSSSSS`
  *    (`DATE_FORMATTER`/`DATE_TIME_FORMATTER`).
  *
  * Spark-first split: the NDJSON action lines are pure Catalyst `to_json`
  * projections (codegen'd, no per-row Jackson on the data path); only the
  * HTTP POST happens in `foreachPartition`, batched `maxActions` per request
  * — at 100 TB the wire cost is O(rows / maxActions) round-trips issued from
  * every executor in parallel, with no driver materialization.
  */
object ElasticsearchBulkFormat {

  /** Render a payload struct for ES: temporal columns become the reference's
    * string formats, everything else passes through. */
  def renderDoc(schema: StructType, prefix: String => Column): Column =
    struct(schema.fields.toSeq.map { f =>
      val c = prefix(f.name)
      (f.dataType match {
        case DateType => date_format(c, "yyyy-MM-dd")
        case TimestampType | TimestampNTZType =>
          date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        case _ => c
      }).as(f.name)
    }: _*)

  /** `_id`: PK values joined with `_` (reference `generateUniqueId`). */
  def docId(pks: Seq[String], prefix: String => Column): Column =
    concat_ws("_", pks.map(k => prefix(k).cast("string")): _*)

  /** `_index` with optional sharding suffix (reference `tableSharding`). */
  def shardedIndex(
      tableId: Column, doc: Column, shardingKey: Option[String],
      separator: String): Column =
    shardingKey match {
      case Some(k) =>
        when(doc.getField(k).isNotNull,
          concat(tableId, lit(separator), doc.getField(k).cast("string")))
          .otherwise(tableId)
      case None => tableId
    }

  /** Bulk NDJSON for one table's materialized batch: index actions (meta line
    * + doc line) for upserts, delete actions (meta line only) for deleted
    * keys. Returns a single-column `action` DataFrame of NDJSON chunks.
    */
  def bulkActions(
      tableId: TableId,
      schema: TableSchema,
      upserts: DataFrame,
      deletedKeys: DataFrame,
      shardingKey: Option[String] = None,
      separator: String = "_"): DataFrame = {
    val pks = schema.primaryKeys
    require(pks.nonEmpty, s"ES sink requires primary keys for $tableId")
    val doc = renderDoc(schema.struct, col)
    val idx = shardedIndex(lit(tableId.identifier), doc, shardingKey, separator)
    val indexMeta = to_json(struct(
      struct(idx.as("_index"), docId(pks, col).as("_id")).as("index")))
    val indexAction = upserts.select(
      concat(indexMeta, lit("\n"), to_json(doc)).as("action"))
    val deleteMeta = to_json(struct(
      struct(lit(tableId.identifier).as("_index"), docId(pks, col).as("_id"))
        .as("delete")))
    indexAction.unionByName(deletedKeys.select(deleteMeta.as("action")))
  }
}

/** [[DataSink]] POSTing bulk actions to an ES-protocol endpoint from every
  * partition. Schema metadata rides the same SchemaManager evolution as the
  * other sinks; ES itself is schemaless on write (dynamic mapping), so DDL is
  * metadata-only here, matching the reference serializer which only updates
  * its converter cache on schema events.
  */
final class ElasticsearchSink(
    baseUrl: String,
    maxActions: Int = 500,
    shardingKey: Map[TableId, String] = Map.empty,
    shardingSeparator: String = "_")
    extends DataSink {

  private val schemas = new SchemaManager

  override def applySchemaChange(event: SchemaChangeEvent): Unit =
    schemas.applySchemaChange(event)

  override def schemaOf(t: TableId): Option[TableSchema] = schemas.latest(t)

  override def writeBatch(t: TableId, upserts: DataFrame, deletedKeys: DataFrame): Unit = {
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val actions = ElasticsearchBulkFormat.bulkActions(
      t, schema, upserts, deletedKeys, shardingKey.get(t), shardingSeparator)
    val url = baseUrl
    val batch = maxActions
    actions.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val client = new ElasticsearchBulkClient(url)
      rows.map(_.getString(0)).grouped(batch).foreach(client.bulk)
    }
  }
}

/** Minimal `/_bulk` HTTP client (java.net.http, one instance per partition).
  * A response with `"errors":true` fails the task — Spark's retry, then the
  * micro-batch replay, provide at-least-once; the PK-addressed `index`
  * operations make redelivery idempotent, same story as the JDBC upsert sink.
  */
final class ElasticsearchBulkClient(baseUrl: String) extends Serializable {
  @transient private lazy val http = java.net.http.HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper

  def bulk(actions: Seq[String]): Unit = {
    if (actions.isEmpty) return
    val body = actions.mkString("", "\n", "\n")
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl/_bulk"))
      .header("Content-Type", "application/x-ndjson")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"_bulk HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
    val root = mapper.readTree(resp.body())
    if (root.path("errors").asBoolean(false))
      throw new java.io.IOException(
        s"_bulk reported item errors: ${root.path("items").toString.take(300)}")
  }
}

/** Loopback ES-protocol double (same zero-egress discipline as
  * [[graft.functions.MockModelServer]]): accepts `/_bulk` NDJSON, maintains
  * an in-memory index→(id→doc) store, answers `{"errors":false}`. Booted on
  * a daemon thread so driver-contract mains never hang on the dispatcher.
  */
object MockElasticsearchServer {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper
  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[String, String]]()

  def reset(): Unit = store.clear()

  def indices: Seq[String] = store.keySet.asScala.toSeq.sorted

  /** (id, docJson) pairs of one index. */
  def docsOf(index: String): Seq[(String, String)] =
    Option(store.get(index)).map(_.asScala.toSeq.sortBy(_._1)).getOrElse(Seq.empty)

  private lazy val server: HttpServer = {
    var booted: HttpServer = null
    var bootError: Throwable = null
    val boot = new Thread(() => {
      try booted = buildServer()
      catch { case t: Throwable => bootError = t }
    }, "mock-es-server-boot")
    boot.setDaemon(true)
    boot.start()
    boot.join()
    if (bootError != null)
      throw new IllegalStateException("mock ES server failed to boot", bootError)
    if (booted == null)
      throw new IllegalStateException("mock ES server boot thread exited without a server")
    booted
  }

  private def buildServer(): HttpServer = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/_bulk", (ex: HttpExchange) =>
      try {
        val lines = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n").iterator.filter(_.nonEmpty)
        var items = 0
        while (lines.hasNext) {
          val meta = mapper.readTree(lines.next())
          if (meta.has("index")) {
            val m = meta.get("index")
            val doc = lines.next() // the document line
            store.computeIfAbsent(m.get("_index").asText,
              _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
              .put(m.get("_id").asText, doc)
            items += 1
          } else if (meta.has("delete")) {
            val m = meta.get("delete")
            Option(store.get(m.get("_index").asText)).foreach(_.remove(m.get("_id").asText))
            items += 1
          }
        }
        val body = s"""{"took":1,"errors":false,"items":[${Seq.fill(items)("{}").mkString(",")}]}"""
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      } finally ex.close())
    s.setExecutor(null)
    s.start()
    sys.addShutdownHook(s.stop(0))
    s
  }

  /** Base URL of the running loopback server (starts it on first use). */
  def url(): String = s"http://127.0.0.1:${server.getAddress.getPort}"
}
