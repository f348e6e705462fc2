package graft.sinks

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Paths

/** Pipeline-facing Delta / Iceberg / Paimon sink (the reference ships
  * `flink-cdc-pipeline-connector-iceberg/` and `.../paimon/` as first-class
  * `sink.type`s): CDC batches merge into an internal [[LakehouseTable]]
  * under `<path>/_staging/<table>` (buckets, COW merge, txn exactly-once),
  * and after every batch/DDL the table mirrors incrementally into the open
  * wire format at `<path>/<table>` — `_delta_log` commits, Iceberg v2
  * snapshots, or Paimon snapshot/manifest files — so an external reader of
  * that format tails the pipeline's output at the pipeline's own commit
  * granularity.
  *
  * Metadata maintenance runs inline, because a standing pipeline writes
  * one interchange commit per micro-batch forever:
  *  - `delta` + `checkpoint.every=N`: a classic checkpoint + `cleanupLog`
  *    whenever N commit JSONs accumulate past the last checkpoint.
  *  - `iceberg` + `snapshots.keep=N`: `expireSnapshots(N)` per sync (a
  *    no-op while history is short).
  *
  * Exactly-once riding through: batch tracking uses the inner lakehouse
  * `txn` action, and BOTH mirrors forward txn bookkeeping, so a reader of
  * the mirrored format can see which (runId, batchId) are durable.
  */
final class MirroredLakehouseSink(
    spark: SparkSession,
    rootDir: String,
    format: String, // "delta" | "iceberg" | "paimon"
    buckets: Int = 16,
    mergeEngine: String = "last-wins",
    checkpointEvery: Int = 0,
    snapshotsKeep: Int = 0,
    fullCompactionEvery: Int = 0)
    extends DataSink {

  require(format == "delta" || format == "iceberg" || format == "paimon",
    s"unknown mirror format $format")
  require(fullCompactionEvery == 0 || format == "paimon",
    "full-compaction.delta-commits is a Paimon option (LSM full compaction)")

  // delta commits since the last full compaction, per table. In-memory:
  // a restart delays the next compaction by at most one cycle, which is
  // maintenance cadence, not correctness
  private val sinceCompaction =
    scala.collection.mutable.Map.empty[TableId, Int].withDefaultValue(0)

  private val inner = new LakehouseSink(
    spark, Paths.get(rootDir, "_staging").toString, buckets,
    collectStats = true, changelog = false, mergeEngine = mergeEngine)

  def table(t: TableId): LakehouseTable = inner.table(t)

  /** The externally-readable Delta/Iceberg directory of one sink table. */
  def mirrorDir(t: TableId): String =
    Paths.get(rootDir, t.identifier.replace('.', '_')).toString

  private def sync(t: TableId): Unit = format match {
    case "delta" =>
      DeltaInterchange.mirror(spark, inner.table(t), mirrorDir(t))
      if (checkpointEvery > 0)
        DeltaInterchange.maintainCheckpoint(spark, mirrorDir(t), checkpointEvery)
    case "iceberg" =>
      IcebergInterchange.mirror(spark, inner.table(t), mirrorDir(t))
      if (snapshotsKeep > 0)
        IcebergInterchange.expireSnapshots(mirrorDir(t), snapshotsKeep)
    case "paimon" =>
      val written = PaimonInterchange.mirror(spark, inner.table(t), mirrorDir(t))
      // the reference Paimon connector's `full-compaction.delta-commits`:
      // run a FULL COMPACTION every N delta commits so readers keep the
      // no-overlap fast path instead of paying an ever-growing LSM merge
      if (fullCompactionEvery > 0) {
        sinceCompaction(t) += written
        if (sinceCompaction(t) >= fullCompactionEvery) {
          PaimonInterchange.compact(spark, mirrorDir(t))
          sinceCompaction(t) = 0
        }
      }
      if (snapshotsKeep > 0)
        PaimonInterchange.expireSnapshots(mirrorDir(t), snapshotsKeep)
  }

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    inner.applySchemaChange(event)
    event match {
      case d: DropTableEvent =>
        // the inner staging table restarts at version 0 if the table is
        // later recreated; a surviving mirror directory would then either
        // keep serving the dropped table's data or diff new-table versions
        // against the old head's recorded progress — delete it so a
        // recreate mirrors from scratch
        val dir = java.nio.file.Paths.get(mirrorDir(d.tableId))
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
      case e => sync(e.tableId)
    }
  }

  override def writeBatch(t: TableId, upserts: DataFrame, deletedKeys: DataFrame): Unit = {
    inner.writeBatch(t, upserts, deletedKeys)
    sync(t)
  }

  override def writeBatch(
      t: TableId, upserts: DataFrame, deletedKeys: DataFrame,
      batchId: Long, runId: String): Unit = {
    inner.writeBatch(t, upserts, deletedKeys, batchId, runId)
    sync(t)
  }

  override def lastCommittedBatch(t: TableId, runId: String): Option[Long] =
    inner.lastCommittedBatch(t, runId)

  override def schemaOf(t: TableId): Option[TableSchema] = inner.schemaOf(t)
}
