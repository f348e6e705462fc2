package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which Spark
  * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`; with it set the
  * column arrives as nanosecond Longs, converted here to a microsecond
  * timestamp (`timestamp_micros(ts div 1000)`), matching DuckDB's
  * `CAST(ts AS TIMESTAMP)` truncation for the oracle compare.
  */
object Tables {

  /** Required session configs for reading the test data. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
