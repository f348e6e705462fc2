package graft.sources.postgres

import graft.operators.Envelope
import graft.sinks.KafkaJsonFormats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline reader for captured Debezium POSTGRES wire records — the
  * logical-decoding sibling of [[graft.sources.debezium.DebeziumFileSource]]
  * (same topology: a directory of JSON-lines topic dumps parsed
  * distributively via `from_json` over `spark.read.text`, so a 100 TB
  * capture parses at scan speed with no per-row deserializer and no driver
  * loop). What differs is everything Postgres-specific:
  *
  *  - the `source` block carries `(db, schema, table, txId, lsn, xmin)`
  *    instead of binlog coordinates (`io.debezium.connector.postgresql
  *    .SourceInfo`; the reference's offset keys in
  *    `PostgresOffset.java:52-63` are exactly `lsn`/`txId`/`ts_usec`);
  *  - the changelog sequence IS the LSN — one int64, already total-ordered
  *    (`PostgresOffset.java:97-101` compares by LSN alone), no coordinate
  *    packing;
  *  - table identity is three-part `db.schema.table` (SURVEY §1:
  *    Postgres = database.schema.table);
  *  - op `r` marks snapshot reads exactly as in the MySQL stream.
  */
object PostgresWireFormat {

  /** Debezium Postgres `source` struct (`io.debezium.connector.postgresql.SourceInfo`). */
  val sourceStruct: StructType = StructType(Seq(
    StructField("version", StringType), StructField("connector", StringType),
    StructField("name", StringType), StructField("ts_ms", LongType),
    StructField("snapshot", StringType), StructField("db", StringType),
    StructField("schema", StringType), StructField("table", StringType),
    StructField("txId", LongType), StructField("lsn", LongType),
    StructField("xmin", LongType)))

  private def messageType(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema), StructField("after", rowSchema),
    StructField("op", StringType), StructField("ts_ms", LongType),
    StructField("source", sourceStruct)))

  /** Parse raw record values (string column) into the graft envelope. The
    * Connect schemas.enable wrapper unwraps via `$.payload` with fallback to
    * the bare record; tombstones and blank lines drop; unknown op codes and
    * unparseable JSON route to [[KafkaJsonFormats.InvalidOp]]. */
  def parse(
      raw: DataFrame,
      rowSchema: StructType,
      valueCol: Column = col("value")): DataFrame = {
    val payload = coalesce(get_json_object(valueCol, "$.payload"), valueCol)
    val m = from_json(payload, messageType(rowSchema))
    val opDecoded = when(m.getField("op") === "c", "INSERT")
      .when(m.getField("op") === "u", "UPDATE")
      .when(m.getField("op") === "d", "DELETE")
      .when(m.getField("op") === "r", "REPLACE")
      .otherwise(KafkaJsonFormats.InvalidOp)
    val src = m.getField("source")
    def metaStr(name: String): Column = coalesce(src.getField(name).cast("string"), lit(""))
    raw
      .filter(valueCol.isNotNull && length(trim(valueCol)) > 0)
      .select(
        concat_ws(".",
          filter(array(src.getField("db"), src.getField("schema"), src.getField("table")),
            c => c.isNotNull && c =!= "")).as(Envelope.TableIdCol),
        opDecoded.as(Envelope.OpCol),
        m.getField("before").as(Envelope.BeforeCol),
        m.getField("after").as(Envelope.AfterCol),
        // the LSN is the sequence: already a total-ordered int64; records
        // with no LSN (some snapshot captures) sort first, where a snapshot
        // belongs
        coalesce(src.getField("lsn"), lit(0L)).as(Envelope.SeqCol),
        map(
          lit("ts_ms"), coalesce(m.getField("ts_ms").cast("string"), lit("")),
          lit("snapshot"), metaStr("snapshot"),
          lit("lsn"), metaStr("lsn"),
          lit("txId"), metaStr("txId"),
          lit("xmin"), metaStr("xmin")).as(Envelope.MetaCol))
  }

  /** Read a directory/glob of captured JSON-lines files (one record value
    * per line). Distributed text scan. */
  def read(spark: SparkSession, path: String, rowSchema: StructType): DataFrame =
    parse(spark.read.text(path), rowSchema)

  /** Serialize an envelope frame to full Debezium Postgres wire records (the
    * inverse of [[parse]]) — fixture author + re-publisher in the format any
    * Debezium consumer understands. `lsn`/`txId` columns let the caller pin
    * real WAL coordinates. */
  def wireValue(
      sourceName: String = "graft",
      lsn: Column = col(Envelope.SeqCol),
      txId: Column = col(Envelope.SeqCol)): Column = {
    val opCode = when(col(Envelope.OpCol) === "INSERT", "c")
      .when(col(Envelope.OpCol) === "UPDATE", "u")
      .when(col(Envelope.OpCol) === "DELETE", "d")
      .when(col(Envelope.OpCol) === "REPLACE", "r")
      .otherwise(col(Envelope.OpCol))
    val parts = split(col(Envelope.TableIdCol), "\\.")
    val db = when(size(parts) >= 3, parts.getItem(0)).otherwise(lit(""))
    val pgSchema = when(size(parts) >= 2, element_at(parts, -2)).otherwise(lit("public"))
    val table = element_at(parts, -1)
    to_json(
      struct(
        col(Envelope.BeforeCol).as("before"),
        col(Envelope.AfterCol).as("after"),
        opCode.as("op"),
        (col(Envelope.SeqCol) + lit(1700000000000L)).as("ts_ms"),
        struct(
          lit("2.4.0").as("version"), lit("postgresql").as("connector"),
          lit(sourceName).as("name"),
          (col(Envelope.SeqCol) + lit(1700000000000L)).as("ts_ms"),
          when(col(Envelope.OpCol) === "REPLACE", "true").otherwise("false")
            .as("snapshot"),
          db.as("db"), pgSchema.as("schema"), table.as("table"),
          txId.as("txId"), lsn.as("lsn"),
          lit(null).cast("long").as("xmin")).as("source")),
      java.util.Map.of("ignoreNullFields", "false"))
  }
}
