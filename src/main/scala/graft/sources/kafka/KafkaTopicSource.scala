package graft.sources.kafka

import graft.core._
import graft.sinks.{KafkaWireConsumer, KafkaWire}
import graft.sources.cdc.{ChangeSource, LogRecord}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka topic-partition as a CHANGE SOURCE: the Debezium-Connect-topic
  * ingestion topology of SURVEY §7.6, read over the REAL wire (Fetch v4 at
  * READ_COMMITTED through [[KafkaWireConsumer]]) instead of a captured file
  * dump. One instance per topic PARTITION — exactly the unit a consumer
  * group assigns — so multi-partition topics compose through the same
  * multi-source merge as multi-database pipelines.
  *
  * Offset mapping: the framework's log offsets are "fromExclusive <
  * offset <= toInclusive" monotone longs; a record at Kafka offset k rides
  * as log offset k+1, so log offset 0 = "nothing consumed" and the head is
  * the partition's end offset. Control markers of the transactional wire
  * consume Kafka offsets without producing records — the framework only
  * needs monotone offsets, not dense ones.
  *
  * The topic is LOG-ONLY: there is no keyed snapshot to chunk, so
  * `snapshotRead` is empty and startup mode `earliest` replays the topic
  * through the log path (the Kafka-source `startingOffsets` semantics the
  * reference's startup modes mirror — SURVEY §2 row 7).
  */
final class KafkaTopicChangeSource(
    bootstrap: String,
    topic: String,
    partition: Int,
    val tableId: TableId,
    val schema: TableSchema,
    groupId: Option[String] = None)
    extends ChangeSource {

  private val mapper = new ObjectMapper()

  // ONE pooled connection: every trigger calls currentOffset + readLog (+
  // commitOffset with a group), and a fresh TCP connect per call would
  // multiply socket churn by partitions × triggers for nothing. A failed
  // call may leave the socket mid-frame, so the pool drops it and the
  // retry layer (WireRetry around readLog) reconnects clean.
  private var pooled: KafkaWireConsumer = null

  private def withConsumer[T](f: KafkaWireConsumer => T): T = synchronized {
    if (pooled == null) pooled = new KafkaWireConsumer(bootstrap)
    try f(pooled)
    catch {
      case e: Throwable =>
        scala.util.Try(pooled.close()); pooled = null; throw e
    }
  }

  override def close(): Unit = synchronized {
    if (pooled != null) { scala.util.Try(pooled.close()); pooled = null }
  }

  /** The LAST-STABLE offset, not the high watermark: this source reads at
    * READ_COMMITTED, so the batch window must never be framed past data
    * the fetch withholds. Cutting at the HW while a producer's transaction
    * is still open would advance the checkpoint over the held-back
    * records; when the producer then commits, `readLog`'s fromExclusive
    * filter skips them forever — silent data loss. With no open
    * transaction the LSO equals the HW. */
  override def currentOffset: Long =
    withConsumer(_.lastStableOffset(topic, partition))

  /** With a `groupId`, checkpoint commits flow to the broker's group
    * coordinator as OffsetCommit — progress is visible to every Kafka
    * tool (lag monitors, `kafka-consumer-groups.sh`) and survives a LOST
    * checkpoint. The mapping is identity: a consumed log offset o means
    * "next Kafka fetch starts at o", which is exactly Kafka's
    * committed-offset convention (committed = next offset to read).
    *
    * The committed position TRAILS the stream by one trigger: Spark feeds
    * a batch's offset back only after the batch is durably in the commit
    * log (`commitSources` at the next trigger's cleanup) — the same safety
    * rule as the Postgres slot feedback above this method's caller
    * (`GraftCdcMicroBatchStream.commit`): never acknowledge past the
    * checkpoint, so a crash-restart replays at-most-one batch. */
  override def commitOffset(offset: Long): Unit =
    groupId.foreach(g => withConsumer(_.commitOffset(g, topic, partition, offset)))

  /** Startup mode `committed` (`StartupOptions.committed()`): the group's
    * OffsetFetch answer, `None` (→ fall back to latest) when the group has
    * never committed for this partition. */
  override def committedOffset: Option[Long] =
    groupId.flatMap(g => withConsumer(_.committedOffset(g, topic, partition)))

  override def snapshotRead(lo: Option[Long], hi: Option[Long]): Seq[Map[String, Any]] =
    Seq.empty // log-only source: the topic IS the history

  override def keyStats: (Option[Long], Option[Long], Long) = (None, None, 0L)

  override def firstDdlOffset(fromEx: Long, toInc: Long): Option[(Long, Seq[SchemaChangeEvent])] =
    None // a data topic carries no DDL; the per-trigger probe must be free

  override def offsetAtTimestamp(ts: Long): Long =
    // broker-side ListOffsets (Kafka's offsetsForTimes): the broker's
    // time index answers in O(log metadata), never a client topic scan —
    // at warehouse scale a startup probe must not read the topic
    withConsumer(_.offsetForTimestamp(topic, partition, ts))
      .map(_._1) // fromExclusive = k delivers the record at k (log k+1)
      .getOrElse(currentOffset)

  /** Bounded at `toInclusive` (kafka offsets < toInclusive ride as log
    * offsets <= toInclusive): a rate-limited catch-up (ReadMaxRows
    * admission) must fetch only its window, not drain the whole backlog
    * and filter — that would be O(backlog²/limit) wire bytes across the
    * catch-up's triggers. */
  override def readLog(fromExclusive: Long, toInclusive: Long): Seq[LogRecord] =
    graft.sources.cdc.WireRetry.withRetries() {
      withConsumer(_.readAllCommitted(topic, partition,
        from = fromExclusive, untilExclusive = toInclusive))
    }.filter(r => r.offset >= fromExclusive && r.offset < toInclusive)
      .map(r => LogRecord(r.offset + 1, r.timestamp, parse(r)))

  /** debezium-json record value → DataChangeEvent, typed by the table
    * schema. An unparseable value THROWS — a corrupt topic must surface,
    * not coin null-image updates (the dead-letter split is a downstream
    * choice; a CDC source's contract is faithful decode). */
  private def parse(r: KafkaWire.WireRecord): DataChangeEvent = {
    val node = mapper.readTree(new String(r.value, UTF_8))
    val before = image(node.get("before"))
    val after = image(node.get("after"))
    node.get("op").asText() match {
      case "c" => DataChangeEvent.insert(tableId, after)
      case "r" => DataChangeEvent.replace(tableId, after)
      case "u" => DataChangeEvent.update(tableId,
        if (before == null) Map.empty[String, Any] else before, after)
      case "d" => DataChangeEvent.delete(tableId, before)
      case other => throw new IllegalArgumentException(
        s"record at $topic/$partition offset ${r.offset}: op '$other' is " +
          "not a debezium op code — refusing rather than guessing")
    }
  }

  private def image(n: JsonNode): Map[String, Any] =
    if (n == null || n.isNull) null
    else schema.struct.fields.map { f =>
      val v = n.get(f.name)
      f.name -> (if (v == null || v.isNull) null else f.dataType match {
        case LongType => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType => v.asDouble()
        case FloatType => v.floatValue()
        case BooleanType => v.asBoolean()
        case TimestampType =>
          java.sql.Timestamp.from(java.time.OffsetDateTime.parse(v.asText()).toInstant)
        case TimestampNTZType =>
          java.time.LocalDateTime.parse(v.asText())
        case _ => v.asText()
      })
    }.toMap
}
