package graft.sinks

import graft.core._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Fluss pipeline sink — the reference's
  * `flink-cdc-pipeline-connector-fluss/` (`sink/v2/FlussSinkWriter.java`,
  * `FlussEventSerializationSchema.java`, `FlussMetadataApplier.java`)
  * re-expressed for a micro-batch engine. The reference delegates to the
  * Fluss client library; what is architecturally distinct about Fluss as
  * a TARGET — and modeled here — is:
  *
  *  - '''Table duality''' — a table WITH a primary key gets an UPSERT
  *    writer (last-write-wins per key, deletes are real deletes); a table
  *    WITHOUT one is an APPEND LOG table: every row is appended and the
  *    server assigns a monotone (bucket, offset) position — Fluss is log
  *    storage first, so the written table is itself a readable stream
  *    (`FlussSinkWriter.write`: `table.newUpsert()` vs `table.newAppend()`).
  *  - '''Async acks drained at the flush barrier''' — the reference
  *    writer issues per-record async futures and `flush()` blocks until
  *    every in-flight ack lands before the checkpoint completes
  *    (at-least-once; PK upserts make redelivery idempotent). The Spark
  *    form: per-partition async HTTP posts with a bounded in-flight
  *    window, all futures joined before the batch returns.
  *  - '''Bucket routing''' — rows hash by bucket key (PK by default) so a
  *    key's writes land in one bucket in order
  *    (`FlussHashFunctionProvider`).
  *
  * The real wire is the Fluss RPC protocol; offline, the loopback double
  * speaks a JSON REST subset with the same lifecycle (create pk/log
  * table, upsert/delete, append with assigned offsets, log scan from an
  * offset), so tests prove the semantics — the StarRocks/ES/MaxCompute
  * loopback precedent.
  */
final class FlussSink(
    baseUrl: String,
    database: String = "fluss",
    buckets: Int = 4,
    maxInFlight: Int = 8)
    extends DataSink {

  private val schemas = new SchemaManager

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    schemas.applySchemaChange(event)
    event match {
      case CreateTableEvent(t, schema) =>
        new FlussClient(baseUrl).createTable(database, t.tableName,
          schema.struct.fieldNames.toSeq, schema.primaryKeys, buckets)
      case _ => ()
    }
  }

  override def schemaOf(t: TableId): Option[TableSchema] = schemas.latest(t)

  override def writeBatch(t: TableId, upserts: DataFrame, deletedKeys: DataFrame): Unit = {
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val pks = schema.primaryKeys
    // temporal columns render in the wire sinks' shared text shape
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    def rendered(n: String) = schema.struct(n).dataType match {
      case DateType => date_format(col(n), "yyyy-MM-dd").as(n)
      case TimestampType | TimestampNTZType =>
        date_format(col(n), "yyyy-MM-dd HH:mm:ss.SSSSSS").as(n)
      case _ => col(n).as(n)
    }
    val cols = schema.struct.fieldNames.toSeq
    val upJson = upserts.select(to_json(struct(cols.map(rendered): _*)).as("row"),
      lit("upsert").as("op"))
    val (u, db, tn, inflight) = (baseUrl, database, t.tableName, maxInFlight)
    if (pks.isEmpty) {
      // APPEND LOG table: no delete concept; every row appends
      upJson.repartition(buckets)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          new FlussClient(u).writeAsync(db, tn, "append",
            it.map(_.getString(0)), inflight)
        }
    } else {
      val delJson = deletedKeys.select(
        to_json(struct(pks.map(rendered): _*)).as("row"), lit("delete").as("op"))
      // bucket by key so a key's writes stay ordered within one writer
      upJson.unionByName(delJson)
        .repartition(buckets, pmod(hash(pks.map(c =>
          get_json_object(col("row"), s"$$.$c")): _*), lit(buckets)))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          // the batch is MATERIALIZED state: each key appears once, as an
          // upsert or a delete, so concurrent in-flight requests can never
          // race on one key within the async window
          new FlussClient(u).writeAsync(db, tn, null,
            it.map(r => s"""{"op":"${r.getString(1)}","row":${r.getString(0)}}"""),
            inflight, mixed = true)
        }
    }
  }
}

/** Minimal Fluss REST client with the async-ack window: up to
  * `maxInFlight` outstanding posts; every future joined before return —
  * the reference writer's mailbox-drained flush barrier. */
final class FlussClient(baseUrl: String) extends Serializable {
  @transient private lazy val http = java.net.http.HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper

  private def checked(resp: java.net.http.HttpResponse[String]): Unit =
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"fluss HTTP ${resp.statusCode()}: ${resp.body().take(300)}")

  def createTable(db: String, table: String, cols: Seq[String],
      pks: Seq[String], buckets: Int): Unit = {
    val n = mapper.createObjectNode()
    val ca = n.putArray("columns"); cols.foreach(ca.add)
    val pa = n.putArray("primaryKeys"); pks.foreach(pa.add)
    n.put("buckets", buckets)
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl/databases/$db/tables/$table"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(n))).build()
    checked(http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()))
  }

  /** Async writes with a bounded in-flight window; ALL acks joined before
    * return. `op` fixed, or null with `mixed = true` (each body line
    * carries its own op). */
  def writeAsync(db: String, table: String, op: String,
      rows: Iterator[String], maxInFlight: Int, mixed: Boolean = false): Unit = {
    val pending = scala.collection.mutable.Queue
      .empty[java.util.concurrent.CompletableFuture[java.net.http.HttpResponse[String]]]
    def drainOne(): Unit = checked(pending.dequeue().join())
    rows.foreach { r =>
      val (theOp, body) =
        if (mixed) {
          val n = mapper.readTree(r)
          (n.get("op").asText(), n.get("row").toString)
        } else (op, r)
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/databases/$db/tables/$table/$theOp"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      pending.enqueue(
        http.sendAsync(req, java.net.http.HttpResponse.BodyHandlers.ofString()))
      if (pending.size >= maxInFlight) drainOne()
    }
    while (pending.nonEmpty) drainOne() // the flush barrier
  }

  /** Log scan: rows of one bucket from `fromOffset` (inclusive). */
  def scanLog(db: String, table: String, bucket: Int,
      fromOffset: Long): Seq[(Long, String)] = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        s"$baseUrl/databases/$db/tables/$table/log?bucket=$bucket&from=$fromOffset"))
      .GET().build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    checked(resp)
    val n = mapper.readTree(resp.body())
    import scala.jdk.CollectionConverters._
    n.get("records").elements().asScala
      .map(r => r.get("offset").asLong() -> r.get("row").toString).toSeq
  }
}

/** Loopback Fluss double: PK tables keep an upsert store; LOG tables
  * append with server-assigned monotone per-bucket offsets and serve
  * offset-based scans — the log-storage semantics that make a written
  * Fluss table itself a readable stream. */
final class MockFlussServer {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper

  private final class Table {
    var columns: Seq[String] = Seq.empty
    var primaryKeys: Seq[String] = Seq.empty
    var buckets: Int = 1
    val rows = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val log = new java.util.concurrent.ConcurrentHashMap[
      Integer, java.util.concurrent.CopyOnWriteArrayList[String]]()
  }
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Table]()

  def rowsOf(db: String, table: String): Seq[(String, String)] =
    Option(tables.get(s"$db.$table"))
      .map(_.rows.asScala.toSeq.sortBy(_._1)).getOrElse(Seq.empty)

  def logSizeOf(db: String, table: String): Long =
    Option(tables.get(s"$db.$table"))
      .map(_.log.asScala.values.map(_.size.toLong).sum).getOrElse(0L)

  private val server: HttpServer = {
    var booted: HttpServer = null
    var bootError: Throwable = null
    val boot = new Thread(() => {
      try booted = buildServer()
      catch { case t: Throwable => bootError = t }
    }, "mock-fluss-boot")
    boot.setDaemon(true)
    boot.start()
    boot.join()
    if (bootError != null)
      throw new IllegalStateException("mock fluss server failed to boot", bootError)
    booted
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def buildServer(): HttpServer = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/databases/", (ex: HttpExchange) =>
      try handle(ex)
      catch {
        case t: Throwable => respond(ex, 500, s"""{"error":"${t.getMessage}"}""")
      } finally ex.close())
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val th = new Thread(r, "mock-fluss"); th.setDaemon(true); th }))
    s.start()
    s
  }

  private def handle(ex: HttpExchange): Unit = {
    // /databases/{db}/tables/{t}[/upsert | /delete | /append | /log]
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    val key = s"${parts(1)}.${parts(3)}"
    parts.drop(4).toSeq match {
      case Seq() =>
        val n = mapper.readTree(ex.getRequestBody)
        val t = tables.computeIfAbsent(key, _ => new Table)
        t.synchronized {
          t.columns = n.get("columns").elements().asScala.map(_.asText()).toSeq
          t.primaryKeys = n.get("primaryKeys").elements().asScala.map(_.asText()).toSeq
          t.buckets = n.get("buckets").asInt(1)
        }
        respond(ex, 200, "{}")
      case Seq("upsert") =>
        val t = required(key, ex); if (t == null) return
        require(t.primaryKeys.nonEmpty, "upsert on a log table")
        val row = mapper.readTree(ex.getRequestBody)
        t.rows.put(t.primaryKeys.map(k => row.path(k).asText()).mkString("_"),
          row.toString)
        respond(ex, 200, "{}")
      case Seq("delete") =>
        val t = required(key, ex); if (t == null) return
        require(t.primaryKeys.nonEmpty, "delete on a log table")
        val row = mapper.readTree(ex.getRequestBody)
        t.rows.remove(t.primaryKeys.map(k => row.path(k).asText()).mkString("_"))
        respond(ex, 200, "{}")
      case Seq("append") =>
        val t = required(key, ex); if (t == null) return
        require(t.primaryKeys.isEmpty, "append on a primary-key table")
        val row = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val bucket = Integer.valueOf(
          java.lang.Math.floorMod(row.hashCode, math.max(t.buckets, 1)))
        val b = t.log.computeIfAbsent(bucket,
          _ => new java.util.concurrent.CopyOnWriteArrayList[String]())
        var offset = 0
        b.synchronized { b.add(row); offset = b.size - 1 }
        respond(ex, 200, s"""{"bucket":$bucket,"offset":$offset}""")
      case Seq("log") =>
        val t = required(key, ex); if (t == null) return
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.nonEmpty)
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val bucket = Integer.valueOf(q.getOrElse("bucket", "0").toInt)
        val from = q.getOrElse("from", "0").toLong
        val recs = Option(t.log.get(bucket))
          .map(_.asScala.toSeq.zipWithIndex.collect {
            case (r, i) if i >= from => s"""{"offset":$i,"row":$r}"""
          }).getOrElse(Seq.empty)
        respond(ex, 200, s"""{"records":[${recs.mkString(",")}]}""")
      case other => respond(ex, 404, s"""{"error":"no route ${other.mkString("/")}"}""")
    }
  }

  private def required(key: String, ex: HttpExchange): Table = {
    val t = tables.get(key)
    if (t == null) respond(ex, 404, """{"error":"no such table"}""")
    t
  }

  def url(): String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}
