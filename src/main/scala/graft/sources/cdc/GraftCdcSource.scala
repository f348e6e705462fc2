package graft.sources.cdc

import graft.core.OperationType
import graft.operators.{ChunkSplitter, Envelope}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** DSv2 incremental-snapshot CDC source — the Spark-native form of the
  * reference's `flink-cdc-base` framework (SURVEY.md §3.3 "Spark shape"):
  *
  *  - phase 1: snapshot chunks become `InputPartition`s; each reader runs the
  *    DBLog LOW/HIGH-watermark protocol of `AbstractScanFetchTask.execute:49`
  *    (LW offset → range select → HW offset → backfill replay of (LW,HW]
  *    restricted to the chunk) — lock-free, exactly-once;
  *  - phase 2: one log-range partition per micro-batch; events already covered
  *    by their chunk's HW are suppressed, the
  *    `IncrementalSourceStreamFetcher` filter;
  *  - the chunk→log switch is `HybridSplitAssigner.getNext:145-166`, here the
  *    monotone `latestOffset` progression (chunks first, then log ranges);
  *  - startup modes `initial | snapshot | earliest | latest | specific-offset |
  *    timestamp` mirror `base/options/StartupOptions.java:38-94`.
  *
  * Chunk rows are emitted with `seq = chunk HW`, log events with `seq =
  * offset`; downstream PK-upsert (`max_by(seq)`) therefore resolves
  * chunk-vs-log races exactly like the reference's watermark ordering.
  */
class GraftCdcProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val src = ChangeSourceRegistry.get(options.get("sourceId"))
    Envelope.envelopeSchema(src.schema.struct)
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCdcTable(schema, properties.get("sourceId"), properties)
}

final class GraftCdcTable(
    tableSchema: StructType,
    sourceId: String,
    properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdc($sourceId)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftCdcMicroBatchStream(
          sourceId,
          tableSchema,
          options.getOrDefault("startup.mode", "initial"),
          options.getLong("startup.specific-offset", 0L),
          options.getLong("startup.timestamp", 0L),
          options.getInt("chunk.size", 8096),
          options.getInt("chunks.per-batch", 4),
          options.getBoolean("backfill.skip", false))
    }
}

/** Offset = (chunks completed, log offset). Pure-chunk batches advance the
  * first component at fixed `logBase`; pure-log batches advance the second.
  */
final case class CdcOffset(chunksDone: Int, logOffset: Long) extends Offset {
  override def json(): String = s"""{"chunksDone":$chunksDone,"logOffset":$logOffset}"""
}
object CdcOffset {
  private val P = """\{"chunksDone":(\d+),"logOffset":(\d+)\}""".r
  def parse(json: String): CdcOffset = json match {
    case P(c, l) => CdcOffset(c.toInt, l.toLong)
    case other => throw new IllegalArgumentException(s"bad offset: $other")
  }
}

final class GraftCdcMicroBatchStream(
    sourceId: String,
    envSchema: StructType,
    startupMode: String,
    specificOffset: Long,
    startupTimestamp: Long,
    chunkSize: Int,
    chunksPerBatch: Int,
    backfillSkip: Boolean)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val source = ChangeSourceRegistry.get(sourceId)

  /** `SnapshotSplitAssigner` chunk plan — computed once at stream start. */
  val chunks: Seq[ChunkSplitter.ChunkRange] = startupMode match {
    case "initial" | "snapshot" =>
      val (mn, mx, cnt) = source.keyStats
      ChunkSplitter.generateSplits(
        mn, mx, cnt,
        ChunkSplitter.Config(chunkSize = chunkSize),
        new ChunkSplitter.Probe { // scripted sources are dense; probe unused on the even path
          def nextChunkMax(from: Long, c: Int) = {
            val keys = source.snapshotRead(Some(from + 1), None)
              .map(r => r(source.schema.primaryKeys.head).toString.toLong).sorted.take(c)
            keys.lastOption
          }
          def minAfter(v: Long) = {
            val keys = source.snapshotRead(Some(v + 1), None)
              .map(r => r(source.schema.primaryKeys.head).toString.toLong)
            if (keys.isEmpty) None else Some(keys.min)
          }
        })
    case _ => Seq.empty
  }

  private val bounded = startupMode == "snapshot"

  /** log position the stream phase starts from (`StreamSplitAssigner` +
    * `StartupOptions` semantics).
    */
  private val logBase: Long = startupMode match {
    case "initial" | "snapshot" | "latest" => source.currentOffset
    // `committed`: no external offset store in this environment, so it falls
    // back to `latest` exactly as `StartupOptions.committed()` documents for
    // a missing committed offset
    case "committed" => source.currentOffset
    case "earliest" => 0L
    case "specific-offset" => specificOffset
    case "timestamp" => source.offsetAtTimestamp(startupTimestamp)
    case other => throw new IllegalArgumentException(s"unknown startup.mode $other")
  }

  private var lastEnd: CdcOffset = CdcOffset(0, logBase)
  private var availableNowTarget: Option[CdcOffset] = None

  private def next(prev: CdcOffset): CdcOffset =
    if (prev.chunksDone < chunks.size)
      CdcOffset(math.min(prev.chunksDone + chunksPerBatch, chunks.size), logBase)
    else if (bounded) CdcOffset(chunks.size, logBase)
    else {
      val target = availableNowTarget.map(_.logOffset).getOrElse(source.currentOffset)
      CdcOffset(chunks.size, math.max(prev.logOffset, target))
    }

  override def initialOffset(): Offset = CdcOffset(0, logBase)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Admission-controlled progression: chunk batches first (at most
    * `chunksPerBatch` per trigger), then log ranges — the `HybridSplitAssigner`
    * phase machine.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    lastEnd = next(start.asInstanceOf[CdcOffset])
    lastEnd
  }

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowTarget = Some(
      if (bounded) CdcOffset(chunks.size, logBase)
      else CdcOffset(chunks.size, source.currentOffset))
  }

  override def reportLatestOffset(): Offset = synchronized {
    availableNowTarget.getOrElse(CdcOffset(chunks.size, source.currentOffset))
  }

  override def deserializeOffset(json: String): Offset = CdcOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset]
    val e = end.asInstanceOf[CdcOffset]
    val chunkParts: Seq[InputPartition] =
      (s.chunksDone until e.chunksDone).map { idx =>
        SnapshotChunkPartition(sourceId, idx, chunks(idx).start, chunks(idx).end, backfillSkip)
      }
    val logParts: Seq[InputPartition] =
      if (e.chunksDone == chunks.size && e.logOffset > s.logOffset)
        Seq(LogRangePartition(
          sourceId, s.logOffset, e.logOffset,
          chunks.map(c => (c.start, c.end)).toArray))
      else Seq.empty
    (chunkParts ++ logParts).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(envSchema, source.schema.struct)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class SnapshotChunkPartition(
    sourceId: String,
    chunkIdx: Int,
    lo: Option[Long],
    hi: Option[Long],
    backfillSkip: Boolean)
    extends InputPartition

final case class LogRangePartition(
    sourceId: String,
    fromExclusive: Long,
    toInclusive: Long,
    chunkRanges: Array[(Option[Long], Option[Long])])
    extends InputPartition

final class CdcReaderFactory(envSchema: StructType, payload: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val serializer = ExpressionEncoder(RowEncoder.encoderFor(envSchema)).createSerializer()
    val fieldNames = payload.fieldNames.toSeq
    def payloadRow(m: Map[String, Any]): Row =
      if (m == null || m.isEmpty) null else Row.fromSeq(fieldNames.map(n => m.getOrElse(n, null)))
    def envRow(tableId: String, op: String, before: Map[String, Any], after: Map[String, Any],
        seq: Long): InternalRow =
      serializer(Row(tableId, op, payloadRow(before), payloadRow(after), seq,
        Map.empty[String, String])).copy()

    partition match {
      case SnapshotChunkPartition(srcId, chunkIdx, lo, hi, skipBackfill) =>
        val source = ChangeSourceRegistry.get(srcId)
        // ---- AbstractScanFetchTask.execute: LW → select → HW → backfill ----
        val lw = source.currentOffset
        val rows = scala.collection.mutable.LinkedHashMap.empty[Long, Map[String, Any]]
        source.snapshotRead(lo, hi).foreach { r =>
          rows(r(source.schema.primaryKeys.head).toString.toLong) = r
        }
        val hw = source.currentOffset
        if (!skipBackfill && hw > lw) {
          source.readLog(lw, hw).foreach { rec =>
            val k = source.keyOfEvent(rec.event)
            // half-open [lo, hi) — matches ChunkRange.predicate, snapshotRead's
            // hiExclusive, the log-phase hwOf filter, and the reference's
            // RecordUtils.splitKeyRangeContains (key < end); an event at
            // key == hi belongs to the NEXT chunk's backfill window
            if (lo.forall(k >= _) && hi.forall(k < _)) {
              rec.event.op match {
                case OperationType.DELETE => rows.remove(k)
                case _ => rows(k) = rec.event.after
              }
            }
          }
        }
        ChangeSourceRegistry.reportChunkHW(srcId, chunkIdx, hw)
        val it = rows.valuesIterator
          .map(r => envRow(source.tableId.identifier, "INSERT", null, r, hw))
        iteratorReader(it)

      case LogRangePartition(srcId, from, to, chunkRanges) =>
        val source = ChangeSourceRegistry.get(srcId)
        def hwOf(key: Long): Long = {
          val idx = chunkRanges.indexWhere { case (lo, hi) =>
            lo.forall(key >= _) && hi.forall(key < _)
          }
          if (idx < 0) 0L else ChangeSourceRegistry.chunkHW(srcId, idx).getOrElse(0L)
        }
        // IncrementalSourceStreamFetcher: suppress events already merged into
        // a finished chunk (offset <= that chunk's HW)
        val it = source.readLog(from, to).iterator
          .filter(rec => chunkRanges.isEmpty ||
            rec.offset > hwOf(source.keyOfEvent(rec.event)))
          .map { rec =>
            val e = rec.event
            envRow(source.tableId.identifier, e.op.toString,
              if (e.before.isEmpty) null else e.before,
              if (e.after.isEmpty) null else e.after,
              rec.offset)
          }
        iteratorReader(it)
    }
  }

  private def iteratorReader(it: Iterator[InternalRow]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
