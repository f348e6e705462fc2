package graft.sinks

import graft.core._
import graft.operators.Envelope
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka pipeline sink — the reference's
  * `flink-cdc-pipeline-connector-kafka/.../KafkaDataSink.java` +
  * `KafkaDataSinkOptions.java`, re-expressed for a micro-batch engine over
  * the real wire ([[KafkaWire]]):
  *
  *  - '''value.format''' `debezium-json` (default) | `canal-json` — the two
  *    serializers of the reference connector, already implemented as
  *    codegen'd `to_json` projections in [[KafkaJsonFormats]].
  *  - '''key.format''' `json` (default) | `csv` — the record key carries the
  *    primary key (`KeySerializationFactory`), so log compaction and
  *    HASH_BY_KEY routing see a stable identity per row.
  *  - '''partition.strategy''' `ALL_TO_ZERO` (default, the reference's
  *    default) | `HASH_BY_KEY` — HASH_BY_KEY routes by murmur2 of the key
  *    BYTES modulo the topic's partition count, byte-identical to Kafka's
  *    own default partitioner, so an external consumer agrees on placement.
  *  - '''Topic routing''' — events go to `<tableId>` by default;
  *    `sink.tableId-to-topic.mapping` ("selector:topic;...") overrides per
  *    table (reference option of the same name); a global `topic` option
  *    overrides everything (`KafkaDataSinkOptions.TOPIC`).
  *  - '''Changelog fidelity''' — this sink consumes the ENVELOPE, not the
  *    materialized batch: every INSERT/UPDATE/REPLACE/DELETE is serialized
  *    in per-key order, exactly like the reference's event-level
  *    serializer. Per-key order survives because rows repartition by their
  *    Kafka partition and sort by sequence before producing.
  *  - '''At-least-once + replay skip''' — the produce path is
  *    at-least-once (acks on append); a committed micro-batch records a
  *    marker in the `__graft_commits` topic AFTER its data lands, and a
  *    restarted run skips batches whose marker is present — the micro-batch
  *    form of the reference's 2PC-optional KafkaSink.
  *
  * DELETE serialization: debezium-json emits `"after":null` tombstone-style
  * records (op "d"); the Kafka RECORD value is never null here — null-value
  * compaction tombstones are a topic-retention concern the reference's
  * serializer also does not emit.
  */
final class KafkaDataSink(
    bootstrap: String,
    valueFormat: String = "debezium-json",
    keyFormat: String = "json",
    partitionStrategy: String = "ALL_TO_ZERO",
    topicOverride: Option[String] = None,
    topicMapping: Seq[(String, String)] = Seq.empty,
    /** `sink.add-tableId-to-header-enabled`: stamp namespace/schemaName/
      * tableName record headers (the reference's
      * `PipelineKafkaRecordSerializationSchema` shape) so consumers of a
      * merged custom topic can route without parsing the value. */
    addTableIdHeaders: Boolean = false,
    /** `sink.custom-header`: "k1:v1,k2:v2" stamped on every record. */
    customHeaders: Seq[(String, String)] = Seq.empty,
    /** `sink.delivery-guarantee`: `at-least-once` (default) or
      * `exactly-once`. Exactly-once wraps each task's produce in a REAL
      * Kafka transaction: a stable per-(topic, task) transactional id, so
      * a retried task FENCES its zombie predecessor (epoch bump aborts
      * the orphaned transaction) and read_committed consumers never see a
      * failed attempt's records — the reference's
      * `DeliveryGuarantee.EXACTLY_ONCE` KafkaSink mode. */
    deliveryGuarantee: String = "at-least-once",
    /** `sink.transactional-id-prefix`: ids are `<prefix>-<runId>-<topic>-
      * <task>` — the runId scopes them to one pipeline run, so pipelines
      * sharing a topic (even with the default prefix) never fence each
      * other's prepared transactions. */
    transactionalIdPrefix: String = "graft-cdc",
    commitTopic: String = "__graft_commits",
    /** `properties.compression.type`: none (default) | gzip | snappy |
      * lz4 | zstd — data batches compress on the wire under the codec's
      * standard framing; commit markers stay uncompressed (tiny, and a
      * recovering scan should never fail on a codec). */
    compressionType: String = "none",
    /** `debezium-json.include-schema.enabled`
      * (`KafkaDataSinkOptions.java:104`): wrap every debezium-json value
      * in the Kafka Connect `{"schema":…,"payload":…}` envelope. */
    includeSchema: Boolean = false)
    extends DataSink with ChangelogSink {

  private val compressionCodec = KafkaWire.codecId(compressionType)

  require(Seq("at-least-once", "exactly-once").contains(deliveryGuarantee),
    s"delivery guarantee '$deliveryGuarantee' is not at-least-once|exactly-once")

  require(Seq("debezium-json", "canal-json").contains(valueFormat),
    s"value.format '$valueFormat' is not debezium-json|canal-json")
  require(!includeSchema || valueFormat == "debezium-json",
    "debezium-json.include-schema.enabled applies to value.format debezium-json only")
  require(Seq("json", "csv").contains(keyFormat),
    s"key.format '$keyFormat' is not json|csv")
  require(Seq("ALL_TO_ZERO", "HASH_BY_KEY").contains(partitionStrategy.toUpperCase),
    s"partition.strategy '$partitionStrategy' is not ALL_TO_ZERO|HASH_BY_KEY")

  private val schemas = new SchemaManager
  private val mapper = new ObjectMapper()
  private val compiledMapping: Seq[(Selectors, String)] =
    topicMapping.map { case (sel, t) => (Selectors.parse(sel), t) }

  def topicFor(t: TableId): String =
    topicOverride.getOrElse(
      compiledMapping.collectFirst { case (sel, topic) if sel.isMatch(t) => topic }
        .getOrElse(t.identifier))

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    schemas.applySchemaChange(event)
    event match {
      case CreateTableEvent(t, _) =>
        // metadata request auto-creates the topic (the connector relies on
        // the broker's auto.create.topics / an admin step; the double's
        // metadata path is that admin step)
        val p = new KafkaWireProducer(bootstrap)
        try p.partitionsOf(topicFor(t)) finally p.close()
      case _ => () // schema rides IN the json envelope; nothing to alter
    }
  }

  override def schemaOf(t: TableId): Option[TableSchema] = schemas.latest(t)

  /** Envelope write: serialize and produce every change event, per-key
    * ordered. The composer calls this instead of the materialized
    * [[writeBatch]] because Kafka is a CHANGELOG target.
    *
    * Exactly-once is TWO-PHASE across the batch's tasks (the micro-batch
    * form of the reference KafkaSink's EXACTLY_ONCE, which holds every
    * subtask's transaction open until the checkpoint completes): tasks
    * produce inside their transactions and leave them OPEN, returning
    * (transactionalId, producerId, epoch) handles to the driver; only
    * after EVERY task has succeeded does the driver write a PREPARE
    * ledger record (the checkpoint analog of Flink's persisted
    * transaction state) and then commit each transaction. Committing at
    * task end instead would let a batch whose job fails after some tasks
    * committed be re-produced whole on replay — duplicating those tasks'
    * records for read_committed consumers. A replay that finds the
    * PREPARE record but no commit marker finishes the COMMITS (by the
    * recorded pid/epoch, no epoch bump) instead of re-producing; a replay
    * that finds neither re-produces cleanly, because re-initializing the
    * stable transactional ids fences and aborts the crashed attempt's
    * open transactions. */
  def writeChangelog(t: TableId, env: DataFrame, batchId: Long, runId: String): Unit = {
    if (batchId >= 0 && runId.nonEmpty) {
      // ONE incremental marker scan answers both replay questions (a scan
      // per question would double the consumer connects and Fetch round
      // trips on the standing-pipeline hot path)
      val (committed, prepared) = synchronized {
        scanMarkers()
        (markerLatest.get((t.identifier, runId)),
          preparedLedger.get((t.identifier, runId, batchId)))
      }
      if (committed.exists(_ >= batchId)) return
      if (deliveryGuarantee == "exactly-once") prepared match {
        case Some(handles) =>
          // a crashed attempt produced EVERYTHING (prepare is written only
          // after every task succeeded) and died mid-commit: finish its
          // commits — re-producing would duplicate the already-committed
          // transactions' records under read_committed
          commitHandles(topicFor(t), handles, recovery = true)
          recordBatchCommit(t, batchId, runId)
          return
        case None => () // no prepared attempt: produce from scratch below
      }
    }
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val topic = topicFor(t)
    val keyCols =
      if (schema.primaryKeys.nonEmpty) schema.primaryKeys
      else schema.struct.fieldNames.toSeq
    val keyStruct = struct(keyCols.map(k =>
      coalesce(col(s"${Envelope.AfterCol}.$k"), col(s"${Envelope.BeforeCol}.$k")).as(k)): _*)
    val keyCol: Column = keyFormat match {
      case "csv" => concat_ws(",", keyCols.map(k =>
        coalesce(col(s"${Envelope.AfterCol}.$k"), col(s"${Envelope.BeforeCol}.$k"))): _*)
      case _ => to_json(keyStruct)
    }
    val valueCol: Column = valueFormat match {
      case "canal-json" => KafkaJsonFormats.canalValue
      case _ if includeSchema =>
        // the schema block derives from the table's CURRENT sink schema —
        // nullability and column DEFAULTs included
        KafkaJsonFormats.debeziumValueWithSchema(schema.struct)
      case _ => KafkaJsonFormats.debeziumValue
    }
    val producer = new KafkaWireProducer(bootstrap)
    val numPartitions = try producer.partitionsOf(topic) finally producer.close()
    val partCol: Column = partitionStrategy.toUpperCase match {
      case "HASH_BY_KEY" =>
        val n = numPartitions
        val byKey = udf((k: String) =>
          KafkaWire.partitionForKey(k.getBytes(UTF_8), n))
        byKey(keyCol)
      case _ => lit(0)
    }
    val frame = env.select(
      partCol.as("kpart"),
      keyCol.as("key"),
      valueCol.as("value"),
      col(Envelope.SeqCol).as("seq"),
      // record CreateTime = EVENT time (connector meta ts_ms) with batch
      // wall-clock as the fallback — never the sequence number: seq values
      // are small integers, and a topic stamped with them breaks every
      // timestamp consumer (broker-side ListOffsets startup, lag monitors
      // that subtract record time from now, retention by time)
      coalesce(
        col(Envelope.MetaCol).getItem("ts_ms").cast("long"),
        lit(System.currentTimeMillis())).as("ts"))
    val boot = bootstrap
    // record headers are constant per (table, batch): the tableId triple
    // (reference: PipelineKafkaRecordSerializationSchema) plus any
    // configured custom headers
    val headers: Seq[(String, Array[Byte])] =
      (if (addTableIdHeaders)
        Seq("namespace" -> Option(t.namespace).getOrElse("").getBytes(UTF_8),
          "schemaName" -> Option(t.schemaName).getOrElse("").getBytes(UTF_8),
          "tableName" -> t.tableName.getBytes(UTF_8))
      else Nil) ++ customHeaders.map { case (k, v) => k -> v.getBytes(UTF_8) }
    // all rows of one Kafka partition land in one task, in sequence order:
    // a single producer appends them as one ordered run of batches
    val exactlyOnce = deliveryGuarantee == "exactly-once"
    // The two-phase path leaves every task's transaction OPEN across task
    // completion; a concurrent SPECULATIVE duplicate attempt would re-init
    // the same transactional id and fence (abort) the completed attempt's
    // open transaction AFTER the driver collected its handle — corrupting
    // the commit phase. Refuse up front rather than fail confusingly later
    // (same requirement JdbcTwoPhaseSink documents; Spark's default is off).
    if (exactlyOnce)
      KafkaDataSink.requireNoSpeculation(
        frame.sparkSession.sparkContext.getConf
          .getBoolean("spark.speculation", defaultValue = false))
    // transactional ids must be scoped to THIS pipeline run: ids keyed only
    // by (prefix, topic, task) would let an independent pipeline sharing
    // the topic fence a crashed run's PREPARED transactions (aborting data
    // its recovery path was about to commit). The runId is the streaming
    // query id — stable across restarts of one checkpoint lineage, so a
    // restart still fences ITS OWN zombies. Untracked writes (no runId)
    // get a unique scope per call: they have no recovery path, and a fixed
    // id would make two concurrent untracked writers fence each other.
    val txnScope =
      if (runId.nonEmpty) runId else java.util.UUID.randomUUID().toString
    val txnPrefix = transactionalIdPrefix
    val codec = compressionCodec
    // phase 1: every task produces (transactionally in exactly-once mode,
    // leaving its transaction OPEN) and returns its txn handle
    val handles: Array[(String, Long, Int)] = frame
      .repartition(math.max(numPartitions, 1), col("kpart"))
      .sortWithinPartitions("kpart", "seq")
      .mapPartitions { (it: Iterator[Row]) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val p = new KafkaWireProducer(boot)
          try {
            val txn: Option[(String, Long, Int)] =
              if (!exactlyOnce) None
              else {
                // STABLE per (topic, task) id: a retry of this task
                // re-inits the same id, which bumps the epoch and aborts
                // the zombie attempt's open transaction — its records
                // stay invisible to read_committed consumers forever
                val txnId = s"$txnPrefix-$txnScope-$topic-" +
                  org.apache.spark.TaskContext.getPartitionId()
                p.findTxnCoordinator(txnId)
                val (pid, epoch) = p.initProducerId(txnId)
                p.addPartitionsToTxn(txnId, pid, epoch, topic,
                  rows.map(_.getInt(0)).distinct.toSeq)
                Some((txnId, pid, epoch))
              }
            try {
              rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).foreach { case (kp, rs) =>
                rs.grouped(1000).foreach { group =>
                  p.produceWithHeaders(topic, kp, group.toSeq.map { r =>
                    (r.getString(1).getBytes(UTF_8), r.getString(2).getBytes(UTF_8),
                      r.getLong(4), headers)
                  }, txn = txn, compression = codec)
                }
              }
              // exactly-once: the transaction stays OPEN — the driver
              // commits it after ALL tasks succeed (phase 2); an eager
              // commit here would make a multi-task batch non-atomic
              // under replay
              txn.iterator
            } catch {
              case e: Throwable =>
                txn.foreach { case (id, pid, epoch) =>
                  scala.util.Try(p.endTxn(id, pid, epoch, commit = false))
                }
                throw e
            }
          } finally p.close()
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt))
      .collect()
    // phase 2 (exactly-once): write the prepare ledger — every task has
    // succeeded, so the data is fully produced — then commit every task's
    // transaction. A crash between prepare and the last commit is healed
    // by the recovery path at the top of this method.
    if (handles.nonEmpty) {
      if (batchId >= 0) recordPrepare(t, batchId, runId, handles.toSeq)
      commitHandles(topic, handles.toSeq, recovery = false)
    }
    if (batchId >= 0) recordBatchCommit(t, batchId, runId)
  }

  /** Commit every prepared transaction by its recorded handle — no
    * InitProducerId (an epoch bump would ABORT the open transaction, the
    * opposite of recovery). In `recovery` mode INVALID_TXN_STATE USUALLY
    * means the crashed attempt already committed this one (after a prepare
    * the driver only ever commits) — but a coordinator-side transaction-
    * timeout ABORT on a broker that does not epoch-bump on abort surfaces
    * with the SAME code, and absorbing that would silently mark a lost
    * batch committed under exactly-once. So a tolerated INVALID_TXN_STATE
    * is verified against the log itself: the commit is accepted only when
    * a COMMIT control marker from this exact (pid, epoch) is present in
    * the topic (the marker the broker appends at EndTxn — a timeout abort
    * leaves an ABORT marker or none). INVALID_PRODUCER_EPOCH means a newer
    * incarnation fenced the producer and its prepared data was aborted —
    * exactly-once is unrecoverable and the failure must surface, never be
    * absorbed as at-least-once. */
  private def commitHandles(topic: String, handles: Seq[(String, Long, Int)],
      recovery: Boolean): Unit = {
    val p = new KafkaWireProducer(bootstrap)
    try {
      // built lazily: only a recovery commit that actually returns
      // INVALID_TXN_STATE pays the marker scan (batch-envelope decode over
      // the topic's partitions, O(log bytes) on the rare recovery path —
      // never on the per-batch hot path)
      lazy val committedMarkers: Set[(Long, Int)] = {
        val c = new KafkaWireConsumer(bootstrap)
        try {
          val n = math.max(p.partitionsOf(topic), 1)
          (0 until n).flatMap(pt => c.controlMarkers(topic, pt))
            .collect { case (pid, epoch, committed) if committed => (pid, epoch) }
            .toSet
        } finally c.close()
      }
      handles.foreach { case (id, pid, epoch) =>
        val err = p.endTxnCode(id, pid, epoch, commit = true)
        val tolerated = recovery && err == KafkaWire.ErrInvalidTxnState &&
          committedMarkers.contains((pid, epoch))
        if (!(err == 0 || tolerated))
          throw new IllegalStateException(
            s"commit of prepared transaction $id (pid=$pid epoch=$epoch) " +
              s"failed with error $err" + (if (err == 47)
                " — fenced by a newer producer epoch; its prepared data was " +
                  "aborted and exactly-once cannot be guaranteed"
              else if (err == KafkaWire.ErrInvalidTxnState && recovery)
                " — no transaction to commit AND no COMMIT control marker " +
                  "from this (pid, epoch) in the log: the prepared " +
                  "transaction was aborted server-side (e.g. coordinator " +
                  "transaction timeout); exactly-once cannot be guaranteed"
              else ""))
      }
    } finally p.close()
  }

  /** Materialized SPI path (direct [[DataSink]] use outside the composer):
    * upserts become REPLACE events, deletes DELETE events with a key-only
    * before image — the same downgrade the reference applies when a
    * non-changelog source feeds its event serializer. */
  override def writeBatch(t: TableId, upserts: DataFrame, deletedKeys: DataFrame): Unit = {
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val rowType = schema.struct
    val ups = Envelope.fromChangelog(
      upserts.withColumn("__op", lit("REPLACE")).withColumn("__seq", lit(0L)),
      t, col("__op"), col("__seq"), rowType.fieldNames.toSeq)
    val delPadded = rowType.fieldNames.foldLeft(deletedKeys) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(rowType(c).dataType))
    }
    val dels = Envelope.fromChangelog(
      delPadded.withColumn("__op", lit("DELETE")).withColumn("__seq", lit(1L)),
      t, col("__op"), col("__seq"), rowType.fieldNames.toSeq)
    writeChangelog(t, ups.unionByName(dels), batchId = -1L, runId = "")
  }

  // ------------------------------------------------- commit marker tracking

  // Incremental marker scan: the commit topic grows one record per batch
  // (two in exactly-once mode: prepare + commit), and a standing pipeline
  // checks it every batch — re-reading from offset 0 each time would be
  // O(commits^2) cumulative. This instance remembers the offset it has
  // consumed to, the latest committed batchId per (table, run), and the
  // prepared-but-uncommitted transaction ledger; a restarted driver's
  // fresh instance pays ONE full scan, then stays incremental.
  private var markerScanOffset = 0L
  private val markerLatest =
    scala.collection.mutable.Map.empty[(String, String), Long]
  private val preparedLedger =
    scala.collection.mutable.Map.empty[(String, String, Long), Seq[(String, Long, Int)]]

  private def scanMarkers(): Unit = synchronized {
    val c = new KafkaWireConsumer(bootstrap)
    try {
      val p = new KafkaWireProducer(bootstrap)
      try p.partitionsOf(commitTopic) finally p.close() // ensure it exists
      val fresh = c.readAll(commitTopic, 0, from = markerScanOffset)
      fresh.foreach { r =>
        // both record kinds are Jackson-written and Jackson-parsed: a
        // regex over interpolated JSON would silently fail to match a
        // table name or runId containing a quote, and an unseen commit
        // marker downgrades replay-skip to duplicate delivery
        try {
          val node = mapper.readTree(new String(r.value, UTF_8))
          if (node != null && node.has("prepare")) {
            val n = node.get("prepare")
            val key = (n.get("table").asText(), n.get("runId").asText(),
              n.get("batchId").asLong())
            import scala.jdk.CollectionConverters._
            preparedLedger(key) = n.get("txns").elements().asScala.map(e =>
              (e.get(0).asText(), e.get(1).asLong(), e.get(2).asInt())).toSeq
          } else if (node != null && node.has("table") && node.has("runId") &&
              node.has("batchId")) {
            val tbl = node.get("table").asText(); val run = node.get("runId").asText()
            val b = node.get("batchId").asLong()
            markerLatest((tbl, run)) = b
            preparedLedger.remove((tbl, run, b)) // batch done: drop its ledger
          }
        } catch {
          // foreign record in the commit topic: ignore — and not just
          // malformed JSON. A record that PARSES but has the wrong shape
          // (e.g. {"prepare":"x"}: get("table") on a text node is null →
          // NPE) must also be skipped, or one poison record pins
          // markerScanOffset forever and every lastCommittedBatch /
          // writeChangelog call on this instance fails from then on.
          case scala.util.control.NonFatal(_) => ()
        }
        markerScanOffset = math.max(markerScanOffset, r.offset + 1)
      }
    } finally c.close()
  }

  override def lastCommittedBatch(t: TableId, runId: String): Option[Long] =
    synchronized {
      if (runId.isEmpty) return None
      scanMarkers()
      markerLatest.get((t.identifier, runId))
    }

  /** Write the prepare ledger record — the micro-batch analog of Flink's
    * checkpointed transaction state: {table, runId, batchId, every task's
    * (transactionalId, producerId, epoch)}. Written AFTER all tasks
    * succeed, BEFORE any transaction commits (write-ahead). */
  private[sinks] def recordPrepare(t: TableId, batchId: Long, runId: String,
      handles: Seq[(String, Long, Int)]): Unit = {
    val root = mapper.createObjectNode()
    val n = root.putObject("prepare")
    n.put("table", t.identifier); n.put("runId", runId); n.put("batchId", batchId)
    val arr = n.putArray("txns")
    handles.foreach { case (id, pid, epoch) =>
      val e = arr.addArray(); e.add(id); e.add(pid); e.add(epoch)
    }
    val p = new KafkaWireProducer(bootstrap)
    try {
      p.partitionsOf(commitTopic)
      p.produce(commitTopic, 0, Seq((
        t.identifier.getBytes(UTF_8),
        mapper.writeValueAsString(root).getBytes(UTF_8),
        batchId)))
    } finally p.close()
  }

  override def recordBatchCommit(t: TableId, batchId: Long, runId: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("table", t.identifier); root.put("runId", runId)
    root.put("batchId", batchId)
    val p = new KafkaWireProducer(bootstrap)
    try {
      p.partitionsOf(commitTopic)
      p.produce(commitTopic, 0, Seq((
        t.identifier.getBytes(UTF_8),
        mapper.writeValueAsString(root).getBytes(UTF_8),
        batchId)))
    } finally p.close()
  }
}

object KafkaDataSink {
  /** Exactly-once precondition: the two-phase path leaves every task's
    * transaction OPEN across task completion, and a concurrent SPECULATIVE
    * duplicate attempt would re-init the same transactional id and fence
    * (abort) the completed attempt's open transaction AFTER the driver
    * collected its handle — corrupting the commit phase. Refuse up front
    * rather than fail confusingly later (the same requirement
    * JdbcTwoPhaseSink documents; Spark's default is off). */
  private[sinks] def requireNoSpeculation(speculationEnabled: Boolean): Unit =
    require(!speculationEnabled,
      "exactly-once Kafka sink requires spark.speculation=false: a " +
        "speculative duplicate task would fence the completed attempt's " +
        "open transaction before the driver commits it")
}
