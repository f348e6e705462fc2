package graft.sinks

import graft.core._
import graft.pipeline.SchemaDerivator
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE sink over parquet — the Delta/Iceberg `MERGE INTO`
  * upsert pattern of the reference's lakehouse sinks
  * (paimon/iceberg connectors under `flink-cdc-pipeline-connectors/`)
  * expressed directly against parquet files, since table-format jars are not
  * part of this environment.
  *
  * Each batch rewrites the table as
  * `(current ANTI JOIN changedKeys) UNION (upserts)` — exactly what a
  * copy-on-write MERGE does file-by-file. Writes go to a versioned directory
  * and a tiny `_VERSION` pointer flips atomically afterwards, so readers never
  * see a half-written table and a failed batch leaves the previous version
  * intact (the idempotent-writer property `DataSinkWriterOperator` gets from
  * Flink checkpoints).
  *
  * Each version is hash-bucketed by PK on write. The rewrite here is
  * whole-table (correct, simple); a production table format bounds it by
  * rewriting only files containing changed keys — that file-pruning is what
  * Delta/Iceberg add on top of exactly this plan shape.
  */
final class ParquetMergeSink(spark: SparkSession, rootDir: String, buckets: Int = 16)
    extends DataSink {

  private val schemas = new SchemaManager

  private def dir(t: TableId): java.nio.file.Path =
    java.nio.file.Paths.get(rootDir, t.identifier.replace('.', '_'))

  private def versionFile(t: TableId) = dir(t).resolve("_VERSION")

  private def currentVersion(t: TableId): Option[Int] = {
    val f = versionFile(t)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f)).trim.toInt)
    else None
  }

  /** Current table contents (empty DataFrame with the evolved schema if no
    * version exists yet).
    */
  def read(t: TableId): DataFrame = {
    val schema = schemas.latest(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    currentVersion(t) match {
      case Some(v) =>
        // stored files may predate the latest schema change: coerce on read
        SchemaDerivator.coerce(
          spark.read.parquet(dir(t).resolve(s"v$v").toString), schema.struct)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema.struct)
    }
  }

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    schemas.applySchemaChange(event)
    event match {
      case TruncateTableEvent(t) =>
        currentVersion(t).foreach { v =>
          writeVersion(t, read(t).limit(0), v + 1)
        }
      case DropTableEvent(t) =>
        val f = versionFile(t)
        java.nio.file.Files.deleteIfExists(f)
      case _ => () // structural changes are metadata-only: coerce-on-read
    }
  }

  private def writeVersion(t: TableId, df: DataFrame, v: Int): Unit = {
    val target = dir(t).resolve(s"v$v")
    val schema = schemas.latest(t).get
    val bucketed =
      if (schema.primaryKeys.nonEmpty)
        df.repartition(buckets, schema.primaryKeys.map(col).toIndexedSeq: _*)
      else df
    bucketed.write.mode(SaveMode.Overwrite).parquet(target.toString)
    val tmp = java.nio.file.Files.write(
      dir(t).resolve(s"_VERSION.tmp"), v.toString.getBytes)
    java.nio.file.Files.move(
      tmp, versionFile(t),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def writeBatch(
      sinkTableId: TableId,
      upserts: DataFrame,
      deletedKeys: DataFrame): Unit = {
    val schema = schemas.latest(sinkTableId).getOrElse(
      throw new IllegalStateException(s"table $sinkTableId not created"))
    val pks = schema.primaryKeys
    require(pks.nonEmpty, s"MERGE sink requires primary keys for $sinkTableId")
    val current = read(sinkTableId)
    val changedKeys = upserts.select(pks.map(col).toIndexedSeq: _*)
      .union(deletedKeys.select(pks.map(col).toIndexedSeq: _*))
    val kept = current.join(broadcast(changedKeys.distinct()), pks, "left_anti")
    val coerced = SchemaDerivator.coerce(upserts, schema.struct)
    val next = kept.union(coerced)
    writeVersion(sinkTableId, next, currentVersion(sinkTableId).map(_ + 1).getOrElse(0))
  }

  // ---- batch-id transactionality: a `_BATCH` pointer next to `_VERSION`,
  // content "runId\nbatchId" so a stale record from a previous run (fresh
  // checkpoint restarts Spark batch ids at 0) never swallows new batches ----

  private def batchFile(t: TableId) = dir(t).resolve("_BATCH")

  override def lastCommittedBatch(t: TableId, runId: String): Option[Long] = {
    val f = batchFile(t)
    if (!java.nio.file.Files.exists(f)) None
    else {
      // a legacy single-line pointer (pre-runId format) cannot be attributed
      // to a run — returning None is the safe direction: at worst one batch
      // re-applies (absorbed by the PK-upsert write), rather than a stale
      // record silently swallowing a fresh run's batches
      val lines = new String(java.nio.file.Files.readAllBytes(f)).split("\n", 2)
      if (lines.length == 2 && lines(0) == runId) Some(lines(1).trim.toLong) else None
    }
  }

  override def recordBatchCommit(t: TableId, batchId: Long, runId: String): Unit = {
    java.nio.file.Files.createDirectories(dir(t))
    val tmp = java.nio.file.Files.write(
      dir(t).resolve("_BATCH.tmp"), s"$runId\n$batchId".getBytes)
    java.nio.file.Files.move(
      tmp, batchFile(t),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def schemaOf(sinkTableId: TableId): Option[TableSchema] =
    schemas.latest(sinkTableId)
}
