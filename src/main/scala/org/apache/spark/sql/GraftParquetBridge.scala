package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Second (and last) `private[sql]`-adjacent door: the vectorized parquet
  * reader as a per-file closure. Spark's own file sources plan scans as
  * `FileFormat.buildReaderWithPartitionValues` → one serializable
  * `PartitionedFile => Iterator[InternalRow]` shipped to executors
  * (`FileScanRDD`); an out-of-tree DSv2 `Batch` that wants the SAME
  * vectorized read path (and not a hand-rolled row decoder) needs that
  * closure built driver-side. This bridge builds it and re-exposes it keyed
  * by plain `(path, fileSize)` so nothing else crosses the package boundary.
  *
  * The returned iterator may yield `ColumnarBatch` disguised as
  * `InternalRow` when whole-stage batch reading kicks in — exactly as
  * Spark's `DataSourceRDD` handles it; callers must flatten (see
  * [[graft.sinks.LakehouseBucketed]]'s reader).
  */
object GraftParquetBridge {

  /** Serializable per-file reader factory. Build on the driver; call on
    * executors. */
  final class FileReader private[GraftParquetBridge] (
      reader: PartitionedFile => Iterator[InternalRow])
      extends ((String, Long) => Iterator[InternalRow]) with Serializable {
    override def apply(path: String, fileSize: Long): Iterator[InternalRow] =
      reader(PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(path),
        0L,
        fileSize,
        Array.empty[String]))
  }

  def parquetReader(
      spark: SparkSession,
      dataSchema: StructType,
      requiredSchema: StructType): FileReader = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fmt = new ParquetFileFormat()
    val hadoopConf = classic.sessionState.newHadoopConfWithOptions(Map.empty)
    // Spark 4 requires the caller to declare whether the reader may return
    // ColumnarBatches; answer with the format's own capability check
    val batches = fmt.supportBatch(classic, requiredSchema)
    new FileReader(fmt.buildReaderWithPartitionValues(
      classic,
      dataSchema = dataSchema,
      partitionSchema = StructType(Nil),
      requiredSchema = requiredSchema,
      filters = Seq.empty,
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH ->
          batches.toString),
      hadoopConf = hadoopConf))
  }
}
