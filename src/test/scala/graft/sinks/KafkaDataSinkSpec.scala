package graft.sinks

import graft.SparkTestBase
import graft.core._
import graft.operators.Envelope
import graft.pipeline.SinkDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka pipeline sink over the real wire: event-level changelog fidelity,
  * HASH_BY_KEY placement identical to Kafka's default partitioner, per-key
  * ordering, topic routing, commit-marker replay skip, and the YAML
  * registry spelling. */
class KafkaDataSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rowT = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))
  private val schema = TableSchema(rowT, primaryKeys = Seq("id"))
  private val tid = TableId.parse("app.users")

  private def changelog(rows: Seq[(Long, String, String, Long)]) =
    Envelope.fromChangelog(
      rows.toDF("id", "v", "__op", "__seq"),
      tid, col("__op"), col("__seq"), Seq("id", "v"))

  test("changelog write: every event reaches the wire as debezium-json, in key order") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      val env = changelog(Seq(
        (1L, "a", "INSERT", 0L), (2L, "b", "INSERT", 1L),
        (1L, "a2", "UPDATE", 2L), (2L, null, "DELETE", 3L),
        (3L, "c", "REPLACE", 4L)))
      sink.writeChangelog(tid, env, batchId = -1L, runId = "")

      val c = new KafkaWireConsumer(broker.bootstrap)
      val recs = c.readAll("app.users", 0)
      c.close()
      assert(recs.size == 5, "five events, five records — no materialization")
      val values = recs.map(r => new String(r.value, UTF_8))
      // ops serialize per the debezium contract: c/u/d, REPLACE -> u
      assert(values.count(_.contains("\"op\":\"c\"")) == 2)
      assert(values.count(_.contains("\"op\":\"u\"")) == 2)
      assert(values.count(_.contains("\"op\":\"d\"")) == 1)
      // key rides as json of the PK
      assert(recs.forall(r => new String(r.key, UTF_8).startsWith("{\"id\":")))
      // per-key order: id=1 INSERT precedes its UPDATE in the log
      val id1 = values.zipWithIndex.filter(_._1.contains("\"id\":1"))
      assert(id1.head._1.contains("\"op\":\"c\"") && id1.last._1.contains("\"op\":\"u\""))
      // record CreateTime is wall-clock (or meta ts_ms), NEVER the envelope
      // sequence — a seq-stamped topic breaks every timestamp consumer
      assert(recs.forall(_.timestamp > 1600000000000L),
        s"timestamps must be epoch-millis, got ${recs.map(_.timestamp)}")
    } finally broker.stop()
  }

  test("HASH_BY_KEY places records where Kafka's own partitioner would") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 4)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap, partitionStrategy = "HASH_BY_KEY")
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      val env = changelog((0 until 40).map(i =>
        (i.toLong, s"v$i", "INSERT", i.toLong)))
      sink.writeChangelog(tid, env, batchId = -1L, runId = "")
      val c = new KafkaWireConsumer(broker.bootstrap)
      val byPart = (0 until 4).map(p => p -> c.readAll("app.users", p)).toMap
      c.close()
      assert(byPart.values.map(_.size).sum == 40)
      byPart.foreach { case (p, recs) =>
        recs.foreach { r =>
          assert(KafkaWire.partitionForKey(r.key, 4) == p,
            s"record keyed ${new String(r.key, UTF_8)} belongs on its murmur2 partition")
        }
        // within a partition, sequence order is preserved
        val ids = recs.map(r => new String(r.key, UTF_8))
        assert(ids == ids.sortBy(k => recs.map(x => new String(x.key, UTF_8)).indexOf(k)))
      }
      assert(byPart.count(_._2.nonEmpty) > 1, "keys actually spread across partitions")
    } finally broker.stop()
  }

  test("commit markers: a replayed micro-batch is skipped, a new run is not masked") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      val b0 = changelog(Seq((1L, "a", "INSERT", 0L)))
      sink.writeChangelog(tid, b0, batchId = 0L, runId = "run1")
      sink.writeChangelog(tid, b0, batchId = 0L, runId = "run1") // replay: skip
      assert(sink.lastCommittedBatch(tid, "run1").contains(0L))
      assert(sink.lastCommittedBatch(tid, "run2").isEmpty,
        "a different run's markers do not mask batches")
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAll("app.users", 0).size == 1, "the replay produced nothing")
      c.close()
      sink.writeChangelog(tid, changelog(Seq((2L, "b", "INSERT", 1L))),
        batchId = 1L, runId = "run1")
      assert(sink.lastCommittedBatch(tid, "run1").contains(1L))
    } finally broker.stop()
  }

  test("topic routing: mapping selectors, then the global topic override") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val mapped = new KafkaDataSink(broker.bootstrap,
        topicMapping = Seq(("app.\\.*", "app-events"), ("other.t", "other-topic")))
      assert(mapped.topicFor(TableId.parse("app.users")) == "app-events")
      assert(mapped.topicFor(TableId.parse("other.t")) == "other-topic")
      assert(mapped.topicFor(TableId.parse("x.y")) == "x.y", "unmapped falls back to tableId")
      val overridden = new KafkaDataSink(broker.bootstrap,
        topicOverride = Some("all-events"),
        topicMapping = Seq(("app.\\.*", "app-events")))
      assert(overridden.topicFor(TableId.parse("app.users")) == "all-events")
    } finally broker.stop()
  }

  test("canal-json value + csv key") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap,
        valueFormat = "canal-json", keyFormat = "csv")
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeChangelog(tid,
        changelog(Seq((7L, "x", "INSERT", 0L), (7L, "x2", "UPDATE", 1L))),
        batchId = -1L, runId = "")
      val c = new KafkaWireConsumer(broker.bootstrap)
      val recs = c.readAll("app.users", 0)
      c.close()
      assert(recs.size == 2)
      assert(recs.forall(r => new String(r.key, UTF_8) == "7"), "csv key is the bare pk")
      val v = recs.map(r => new String(r.value, UTF_8))
      assert(v.head.contains("\"type\":\"INSERT\"") && v.last.contains("\"type\":\"UPDATE\""))
      assert(v.last.contains("\"data\":[{") && v.last.contains("\"database\":\"app\""))
    } finally broker.stop()
  }

  test("materialized SPI path downgrades to REPLACE/DELETE events") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeBatch(tid, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
        Seq(3L).toDF("id"))
      val c = new KafkaWireConsumer(broker.bootstrap)
      val values = c.readAll("app.users", 0).map(r => new String(r.value, UTF_8))
      c.close()
      assert(values.count(_.contains("\"op\":\"u\"")) == 2, "upserts ride as u")
      assert(values.count(_.contains("\"op\":\"d\"")) == 1, "deletes ride as d")
    } finally broker.stop()
  }

  test("record headers: tableId triple + custom headers ride the wire") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap,
        topicOverride = Some("merged"),
        addTableIdHeaders = true,
        customHeaders = Seq("env" -> "prod"))
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeChangelog(tid, changelog(Seq((1L, "a", "INSERT", 0L))),
        batchId = -1L, runId = "")
      val c = new KafkaWireConsumer(broker.bootstrap)
      val recs = c.readAll("merged", 0)
      c.close()
      assert(recs.size == 1)
      val hs = recs.head.headers.map { case (k, v) => k -> new String(v, UTF_8) }.toMap
      assert(hs("tableName") == "users" && hs("schemaName") == "app")
      assert(hs("env") == "prod")
    } finally broker.stop()
  }

  test("exactly-once delivery: batches ride real transactions, read_committed sees them") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 2)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap,
        partitionStrategy = "HASH_BY_KEY",
        deliveryGuarantee = "exactly-once")
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      sink.writeChangelog(tid,
        changelog((0 until 20).map(i => (i.toLong, s"v$i", "INSERT", i.toLong))),
        batchId = 0L, runId = "r1")
      // a second batch re-inits the same per-task transactional ids: the
      // epoch bumps and commits keep flowing — no stuck state
      sink.writeChangelog(tid,
        changelog(Seq((5L, "v5b", "UPDATE", 100L))),
        batchId = 1L, runId = "r1")
      val c = new KafkaWireConsumer(broker.bootstrap)
      val committed = (0 until 2).flatMap(p =>
        c.readAllCommitted("app.users", p))
      c.close()
      assert(committed.size == 21,
        s"all 21 events committed transactionally, got ${committed.size}")
      assert(committed.map(r => new String(r.value, UTF_8))
        .count(_.contains("v5b")) == 1)
    } finally broker.stop()
  }

  test("two-phase exactly-once: a crash between prepare and commit is healed, never re-produced") {
    // The non-atomic-batch shape this protocol exists for: every task
    // produced, the prepare ledger landed, and only SOME of the
    // transactions committed before the driver died. The replay must
    // finish the COMMITS by the recorded (pid, epoch) — re-producing the
    // batch would duplicate the already-committed transaction's records
    // for read_committed consumers.
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap,
        deliveryGuarantee = "exactly-once")
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      // the crashed attempt, by hand: two open transactions, fully produced
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.users")
      val id0 = "graft-cdc-r1-app.users-0"
      val (pid0, ep0) = p.initProducerId(id0)
      p.addPartitionsToTxn(id0, pid0, ep0, "app.users", Seq(0))
      p.produceWithHeaders("app.users", 0, (1 to 3).map(i =>
        (s"$i".getBytes(UTF_8), s"""{"v":"crashed-$i"}""".getBytes(UTF_8),
          i.toLong, Nil)),
        txn = Some((id0, pid0, ep0)))
      val id1 = "graft-cdc-r1-app.users-1"
      val (pid1, ep1) = p.initProducerId(id1)
      p.addPartitionsToTxn(id1, pid1, ep1, "app.users", Seq(0))
      p.produceWithHeaders("app.users", 0, Seq(
        ("9".getBytes(UTF_8), """{"v":"crashed-9"}""".getBytes(UTF_8), 9L, Nil)),
        txn = Some((id1, pid1, ep1)))
      sink.recordPrepare(tid, 0L, "r1", Seq((id0, pid0, ep0), (id1, pid1, ep1)))
      p.endTxn(id1, pid1, ep1, commit = true) // one commit landed, then crash
      p.close()
      // the replay: commits the surviving transaction, skips producing
      sink.writeChangelog(tid,
        changelog(Seq((99L, "MUST_NOT_APPEAR", "INSERT", 0L))),
        batchId = 0L, runId = "r1")
      val c = new KafkaWireConsumer(broker.bootstrap)
      val vals = c.readAllCommitted("app.users", 0)
        .map(r => new String(r.value, UTF_8))
      c.close()
      assert(vals.size == 4 && vals.count(_.contains("crashed-")) == 4,
        s"every prepared record committed exactly once, got $vals")
      // the batch is now marker-committed: a further replay is a plain skip
      sink.writeChangelog(tid,
        changelog(Seq((100L, "ALSO_NOT", "INSERT", 0L))), 0L, "r1")
      val c2 = new KafkaWireConsumer(broker.bootstrap)
      assert(c2.readAllCommitted("app.users", 0).size == 4)
      c2.close()
    } finally broker.stop()
  }

  test("a poison record in the commit topic is skipped, never pins the marker scan") {
    // Foreign records land in the commit topic first — including one that
    // PARSES as JSON but has the wrong shape ({"prepare":"x"}: get("table")
    // on a text node is null). The scan must skip all of them AND advance
    // its offset past them; a poison record that pinned markerScanOffset
    // would fail every later lastCommittedBatch/writeChangelog call.
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap)
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("__graft_commits")
      p.produce("__graft_commits", 0, Seq(
        ("junk".getBytes(UTF_8), """{"prepare":"x"}""".getBytes(UTF_8), 1L),
        ("junk".getBytes(UTF_8), "not json at all".getBytes(UTF_8), 2L),
        ("junk".getBytes(UTF_8), """{"prepare":{"batchId":7}}""".getBytes(UTF_8), 3L)))
      p.close()
      sink.writeChangelog(tid, changelog(Seq((1L, "a", "INSERT", 0L))), 0L, "r1")
      assert(sink.lastCommittedBatch(tid, "r1").contains(0L),
        "the real marker behind the poison records must be seen")
      // replay of batch 0 is a plain skip — nothing re-produced
      sink.writeChangelog(tid, changelog(Seq((2L, "DUP", "INSERT", 1L))), 0L, "r1")
      val c = new KafkaWireConsumer(broker.bootstrap)
      assert(c.readAll("app.users", 0).size == 1)
      c.close()
    } finally broker.stop()
  }

  test("recovery refuses a prepared transaction that was aborted server-side") {
    // INVALID_TXN_STATE on a recovery commit is ambiguous: "already
    // committed" and "aborted by the coordinator (transaction timeout, no
    // epoch bump)" answer the same code. The recovery path verifies against
    // the log: no COMMIT control marker from the recorded (pid, epoch) →
    // the batch is LOST, and exactly-once must fail loudly, never silently
    // mark it committed.
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 1)
    broker.start()
    try {
      val sink = new KafkaDataSink(broker.bootstrap,
        deliveryGuarantee = "exactly-once")
      sink.applySchemaChange(CreateTableEvent(tid, schema))
      val p = new KafkaWireProducer(broker.bootstrap)
      p.partitionsOf("app.users")
      val id0 = "graft-cdc-r1-app.users-0"
      val (pid0, ep0) = p.initProducerId(id0)
      p.addPartitionsToTxn(id0, pid0, ep0, "app.users", Seq(0))
      p.produceWithHeaders("app.users", 0, Seq(
        ("1".getBytes(UTF_8), """{"v":"lost"}""".getBytes(UTF_8), 1L, Nil)),
        txn = Some((id0, pid0, ep0)))
      sink.recordPrepare(tid, 0L, "r1", Seq((id0, pid0, ep0)))
      p.endTxn(id0, pid0, ep0, commit = false) // server-side abort, then crash
      p.close()
      val ex = intercept[IllegalStateException] {
        sink.writeChangelog(tid,
          changelog(Seq((99L, "X", "INSERT", 0L))), 0L, "r1")
      }
      assert(ex.getMessage.contains("aborted server-side"), ex.getMessage)
    } finally broker.stop()
  }

  test("exactly-once refuses spark.speculation=true up front") {
    // the two-phase path leaves transactions open across task completion; a
    // speculative duplicate would fence the completed attempt's transaction
    // after the driver collected its handle. (spark.speculation is a core
    // conf immutable at runtime, so the guard is exercised directly; the
    // write path feeds it sparkContext.getConf's value.)
    val ex = intercept[IllegalArgumentException] {
      KafkaDataSink.requireNoSpeculation(speculationEnabled = true)
    }
    assert(ex.getMessage.contains("speculation"))
    KafkaDataSink.requireNoSpeculation(speculationEnabled = false) // no throw
  }

  test("YAML registry: sink.type kafka resolves with the reference's options") {
    val broker = new KafkaBrokerDouble(autoCreatePartitions = 2)
    broker.start()
    try {
      val sink = DataSinks.forDef(spark, SinkDef("kafka", None, Map(
        "properties.bootstrap.servers" -> broker.bootstrap,
        "value.format" -> "debezium-json",
        "partition.strategy" -> "HASH_BY_KEY",
        "properties.compression.type" -> "snappy",
        "sink.tableId-to-topic.mapping" -> "app.\\.*:routed;x.y:other")))
      val k = sink.asInstanceOf[KafkaDataSink]
      assert(k.topicFor(TableId.parse("app.users")) == "routed")
      k.applySchemaChange(CreateTableEvent(tid, schema))
      k.writeBatch(tid, Seq((1L, "a")).toDF("id", "v"), spark.range(0).select($"id"))
      assert(broker.topicNames.contains("routed"))
      intercept[IllegalArgumentException](
        DataSinks.forDef(spark, SinkDef("kafka", None, Map.empty)))
      intercept[IllegalArgumentException](
        DataSinks.forDef(spark, SinkDef("kafka", None, Map(
          "properties.bootstrap.servers" -> broker.bootstrap,
          "properties.compression.type" -> "brotli"))))
    } finally broker.stop()
  }

  // the Connect schema block (`DebeziumJsonSerializationSchema.java:250-320`
  // via Kafka's JsonConverter.asJsonSchema): DECIMAL is the logical Decimal
  // (bytes + scale/connect.decimal.precision parameters), DATE the Debezium
  // Date int32, TIMESTAMP(NTZ) MicroTimestamp, TINYINT/SMALLINT both int16,
  // and defaults render as VALID JSON tokens (non-numeric defaults on
  // non-string columns must quote, not splice raw)
  test("connect schema json: logical types, int16 widening, safe defaults") {
    val withDefault = new MetadataBuilder()
      .putString(AddColumnEvent.DefaultKey, "CURRENT_TIMESTAMP").build()
    val st = StructType(Seq(
      StructField("t", ByteType, nullable = false),
      StructField("s", ShortType, nullable = true),
      StructField("d", DecimalType(10, 2), nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampNTZType, nullable = true, withDefault)))
    val json = KafkaJsonFormats.connectSchemaJson(st)
    // structurally valid JSON end to end
    spark.range(1).select(
      from_json(lit(json), schema_of_json(lit(json)))).collect()
    assert(json.contains(""""type":"int16","optional":false,"field":"t""""))
    assert(json.contains(""""type":"int16","optional":true,"field":"s""""))
    assert(json.contains(
      """"type":"bytes","optional":true,"name":"org.apache.kafka.connect.data.Decimal","version":1,""" +
        """"parameters":{"scale":"2","connect.decimal.precision":"10"},"field":"d""""))
    assert(json.contains(
      """"type":"int32","optional":true,"name":"io.debezium.time.Date","version":1,"field":"dt""""))
    assert(json.contains(
      """"type":"int64","optional":true,"name":"io.debezium.time.MicroTimestamp","version":1,""" +
        """"default":"CURRENT_TIMESTAMP","field":"ts""""))
    // a numeric default on a numeric column still splices raw
    val numDefault = new MetadataBuilder()
      .putString(AddColumnEvent.DefaultKey, "42").build()
    val st2 = StructType(Seq(StructField("n", IntegerType, nullable = true, numDefault)))
    assert(KafkaJsonFormats.connectSchemaJson(st2).contains(""""default":42,"field":"n""""))
  }
}
