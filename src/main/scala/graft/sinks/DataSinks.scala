package graft.sinks

import graft.pipeline.SinkDef
import org.apache.spark.sql.SparkSession

/** Sink registry: maps a YAML `sink.type` to a concrete [[DataSink]] — the
  * Spark form of the reference's `DataSinkFactory` SPI discovery
  * (`composer/.../FactoryDiscoveryUtils` over
  * `flink-cdc-pipeline-connectors/`).
  */
object DataSinks {

  def forDef(spark: SparkSession, sinkDef: SinkDef): DataSink =
    sinkDef.sinkType.toLowerCase match {
      case "values" | "memory" => new MemoryDatabase
      case "jdbc" =>
        new JdbcUpsertSink(
          url = sinkDef.config.getOrElse(
            "url", throw new IllegalArgumentException("jdbc sink requires 'url'")),
          dialectName = sinkDef.config.getOrElse("dialect", "generic"),
          props = sinkDef.config.view
            .filterKeys(_.startsWith("driver.")).toMap
            .map { case (k, v) => k.stripPrefix("driver.") -> v },
          batchSize = sinkDef.config.getOrElse("batch.size", "1024").toInt)
      case "parquet" | "lakehouse" =>
        new ParquetMergeSink(
          spark,
          rootDir = sinkDef.config.getOrElse(
            "path", throw new IllegalArgumentException("parquet sink requires 'path'")),
          buckets = sinkDef.config.getOrElse("buckets", "16").toInt)
      case other =>
        throw new IllegalArgumentException(
          s"unknown sink type '$other' (supported: values, jdbc, parquet)")
    }
}
