package graft.streaming

import graft.sinks.LakehouseTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The lakehouse change feed as a STREAMING SOURCE: commit versions are the
  * offsets, each micro-batch reads the net-new rows of a bounded commit range
  * through [[LakehouseTable.readChangesBetween]], and a standing
  * `StreamingQuery` replaces the poll-and-rerun CLI loop — the reference's
  * continuous-pipeline model (`FlinkPipelineComposer.java:115-260`, where a
  * composed pipeline is one long-running job, not a scheduled batch).
  *
  * Built on the `Source`/`StreamSourceProvider` API — the same API Delta
  * Lake's `DeltaSource` uses for exactly this shape — rather than a DSv2
  * `MicroBatchStream`, deliberately: `getBatch` returns a full `DataFrame`,
  * so the batch reuses Spark's entire vectorized parquet scan, mergeSchema,
  * and the table format's schema coercion. A DSv2 `PartitionReader` would
  * have to re-implement parquet-to-`InternalRow` decoding by hand — a worse
  * engine wearing a newer interface. Admission control is source-side offset
  * capping (`maxCommitsPerBatch`), the same mechanism as Spark's own
  * `FileStreamSource.maxFilesPerTrigger`.
  *
  * Offset semantics (exactly-once with the checkpoint):
  *  - offset N = "all commits `<= N` have been delivered"; batches are the
  *    half-open commit ranges `(start, end]` — replaying a checkpointed range
  *    re-reads exactly the same immutable commits (the log never mutates).
  *  - maintenance rewrites (compaction, rescale) are data-identical and are
  *    skipped by `readChangesBetween`, so a consumer never re-receives rows
  *    the table merely moved — but the offset still advances past them.
  *  - `startingVersion` = deliver from that commit on (`0` streams the whole
  *    table as the first batches — backfill-then-tail); default tails only
  *    commits after query start.
  *
  * Append-table semantics only, as with the batch change feed: MERGE commits
  * rewrite whole buckets, so their adds are not net-new rows.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft-lakehouse")
  *   .option("path", tableDir)
  *   .option("startingVersion", "0")     // optional: backfill from commit 0
  *   .option("maxCommitsPerBatch", "1")  // optional: bound batch size
  *   .load()
  * }}}
  */
final class LakehouseStreamSource(
    spark: SparkSession,
    tableDir: String,
    startingVersion: Option[Long],
    maxCommitsPerBatch: Option[Int],
    changelogMode: Boolean = false) extends Source {

  maxCommitsPerBatch.foreach(m =>
    require(m >= 1, s"maxCommitsPerBatch must be >= 1: $m"))

  private val table = new LakehouseTable(spark, tableDir)

  // the version already fully delivered before the query starts: one before
  // `startingVersion` when given, else everything committed so far (tail mode)
  private val baseVersion: Long =
    startingVersion.map(_ - 1).getOrElse(table.latestVersion())

  override val schema: StructType =
    if (changelogMode) LakehouseStreamSource.changelogSchema(table)
    else table.snapshot().schema.struct

  /** Next batch end: the latest commit, capped `maxCommitsPerBatch` past the
    * last planned offset. `None` while nothing new — the query idles without
    * planning empty batches. */
  override def getOffset: Option[V1Offset] = {
    val latest = table.latestVersion()
    val from = lastPlanned.getOrElse(baseVersion)
    if (latest <= from) None
    else {
      val end = maxCommitsPerBatch.fold(latest)(m => math.min(latest, from + m))
      lastPlanned = Some(end)
      Some(LongOffset(end))
    }
  }

  // highest offset handed to the engine; getOffset must keep advancing from
  // here even before the engine commits the previous batch
  private var lastPlanned: Option[Long] = None

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(toVersion).getOrElse(baseVersion)
    val to = toVersion(end)
    // recovery: a restarted query replans from the checkpointed offset, which
    // getOffset's in-memory cursor hasn't seen yet
    lastPlanned = Some(math.max(lastPlanned.getOrElse(Long.MinValue), to))
    // a mid-stream schema evolution must FAIL the query, not silently coerce:
    // projecting the batch back to the stream's declared schema would drop
    // the evolved columns' data. Restarting adopts the new schema — the same
    // contract Delta's streaming source enforces.
    val declared =
      if (changelogMode) LakehouseStreamSource.changelogSchema(table)
      else table.snapshot().schema.struct
    if (declared != schema)
      throw new IllegalStateException(
        s"schema of $tableDir changed mid-stream (was ${schema.simpleString}, " +
          s"now ${declared.simpleString}); restart the query to adopt it")
    // the engine requires isStreaming=true on a v1 source's batches
    org.apache.spark.sql.GraftStreamingBridge.asStreaming(
      if (changelogMode) table.readChangelogBetween(from, to)
      else table.readChangesBetween(from, to))
  }

  private def toVersion(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    // a checkpoint-recovered offset arrives re-serialized; LongOffset.json is
    // the bare version number
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}

object LakehouseStreamSource {
  /** Declared table columns + `_change_type` + `_commit_version` — the shape
    * [[LakehouseTable.readChangelogBetween]] produces. */
  private[streaming] def changelogSchema(table: LakehouseTable): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val snap = table.snapshot()
    require(snap.meta.exists(_.changelog),
      s"readChanges mode 'changelog' requires a changelog-enabled table: ${table.dir}")
    StructType(snap.schema.struct.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
  }
}

/** `spark.read.format("graft-lakehouse")` — the BATCH side of the format:
  * a `PrunedFilteredScan` relation whose pushed filters drive the table's
  * ZONE-MAP file pruning (EqualTo/In/range/And/Or translate; anything else
  * conservatively keeps files, and Spark re-applies every filter exactly),
  * with MOR deletes applied. One format string serves batch reads, the
  * change-feed stream, and the changelog stream. */
final class LakehouseRelation(
    override val sqlContext: SQLContext,
    tableDir: String)
    extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {

  private val table = new LakehouseTable(sqlContext.sparkSession, tableDir)

  override def schema: StructType = table.snapshot().schema.struct

  // pruning is best-effort file skipping; every filter must still run
  override def unhandledFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] =
    filters

  override def buildScan(
      requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    table.scanWithFilters(requiredColumns, filters).rdd
}

/** Registers `format("graft-lakehouse")` (and the fully-qualified class name)
  * as a streaming source over a lakehouse table directory. */
final class LakehouseStreamProvider extends StreamSourceProvider with DataSourceRegister
    with org.apache.spark.sql.sources.RelationProvider {

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation =
    new LakehouseRelation(sqlContext, tableDir(parameters))

  override def shortName(): String = "graft-lakehouse"

  private def tableDir(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-lakehouse source requires option(\"path\", <table dir>)"))

  /** `mode`: `feed` (default — net-new rows of append tables) or
    * `changelog` (row-level changes of a changelog-enabled MERGE table:
    * declared columns + `_change_type` + `_commit_version`). */
  private def changelogMode(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("mode", "feed") match {
      case "feed" => false
      case "changelog" => true
      case other => throw new IllegalArgumentException(
        s"unknown graft-lakehouse mode '$other' (feed | changelog)")
    }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      schema.getOrElse {
        val t = new LakehouseTable(sqlContext.sparkSession, tableDir(parameters))
        if (changelogMode(parameters)) LakehouseStreamSource.changelogSchema(t)
        else t.snapshot().schema.struct
      })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new LakehouseStreamSource(
      sqlContext.sparkSession,
      tableDir(parameters),
      parameters.get("startingVersion").map(_.toLong),
      parameters.get("maxCommitsPerBatch").map(_.toInt),
      changelogMode(parameters))
}
