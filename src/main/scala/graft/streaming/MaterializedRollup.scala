package graft.streaming

import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming MATERIALIZED ROLLUP: maintain an aggregate-merge-engine table
  * as a standing query over another lakehouse table's change feed — the
  * incremental materialized view for append-only facts (Paimon's
  * "aggregation table fed by a streaming job"; the reference composes the
  * same thing as source → pre-aggregate → Paimon sink in
  * `FlinkPipelineComposer.java:115-260`).
  *
  * Per micro-batch: the increment pre-aggregates per key — map-side partials,
  * one batch-bounded shuffle, and the PK-unique output the merge engine's
  * intra-batch fold no longer even requires — then MERGEs into the rollup,
  * the aggregate engine folding batch into stored row per column. Spark's
  * batch id rides as a `txn` action in the SAME commit as the data, so a
  * crash-replayed micro-batch skips wholesale: exactly-once maintenance with
  * no recomputation, and the table IS the view — every commit a consistent
  * rollup, readable mid-maintenance.
  *
  * 100 TB shape: per-batch cost is O(increment) + O(touched buckets), never
  * O(view); the one shuffle is over the increment's distinct keys; the fold
  * arithmetic (sum/max/min) is associative so history never replays.
  */
object MaterializedRollup {

  /** What to maintain: `keys` group the source rows; `aggs` maps source
    * columns to their fold (`sum | max | min | approx_distinct`); `countCol`,
    * when set, adds a row-count column (folded by sum — count is a sum of
    * partial counts). `decimalSum` upgrades named sum columns to exact
    * DECIMAL(p, s) accumulation (floating-point sums are order-dependent; a
    * rollup folded in commit order would drift from a one-shot aggregate).
    *
    * `approx_distinct` maintains a per-key distinct-count over the column's
    * RAW values via a Datasketches HLL sketch: each increment sketches its
    * values (`hll_sketch_agg`), the merge engine unions sketches
    * (`hll_union`), and [[readView]] reports the estimate. COUNT(DISTINCT)
    * is the one common rollup that is NOT distributive over raw values —
    * the mergeable sketch is what makes it incrementally maintainable
    * without ever replaying history, the same trick Druid/Pinot use. A
    * value seen in many increments is counted once: union, not addition. */
  final case class RollupSpec(
      keys: Seq[String],
      aggs: Map[String, String],
      countCol: Option[String] = None,
      decimalSum: Map[String, (Int, Int)] = Map.empty) {
    require(keys.nonEmpty, "rollup needs at least one key column")
    require(aggs.nonEmpty || countCol.nonEmpty, "rollup needs at least one aggregate")
    aggs.foreach { case (c, f) =>
      require(Seq("sum", "max", "min", "approx_distinct").contains(f),
        s"unknown rollup aggregation '$f' for column '$c' " +
          "(sum | max | min | approx_distinct)")
      require(!keys.contains(c), s"column '$c' cannot be both key and aggregate")
    }
    decimalSum.keys.foreach(c => require(aggs.get(c).contains("sum"),
      s"decimalSum column '$c' must be a sum aggregation"))
  }

  /** The run id under which maintenance records Spark's micro-batch id as a
    * `txn` action in the rollup table's commits. */
  val RollupRunId = "graft-rollup"

  /** Rollup table schema derived from the source's: keys keep their source
    * types (non-null), sum/max/min keep theirs (decimal overrides apply),
    * the count column is LONG. */
  def targetSchema(source: StructType, spec: RollupSpec): TableSchema = {
    val byName = source.fields.map(f => f.name -> f).toMap
    def field(c: String): StructField = byName.getOrElse(c,
      throw new IllegalArgumentException(
        s"rollup column '$c' not in source schema ${source.simpleString}"))
    val keyFields = spec.keys.map(k => field(k).copy(nullable = false))
    val aggFields = spec.aggs.toSeq.sortBy(_._1).map {
      case (c, "approx_distinct") => StructField(c, BinaryType) // HLL sketch
      case (c, "sum") =>
        spec.decimalSum.get(c) match {
          case Some((p, s)) => StructField(c, DecimalType(p, s))
          case None => StructField(c, widenedSumType(field(c).dataType))
        }
      case (c, _) =>
        spec.decimalSum.get(c) match {
          case Some((p, s)) => StructField(c, DecimalType(p, s))
          case None => field(c)
        }
    }
    val countField = spec.countCol.map(StructField(_, LongType)).toSeq
    TableSchema(
      StructType(keyFields ++ aggFields ++ countField),
      primaryKeys = spec.keys)
  }

  /** A SUM column's stored type: Spark's `sum()` itself widens integrals
    * to LONG and float to DOUBLE — casting the running total back down to
    * the source type would WRAP silently past 2^31 on any count-like fact
    * column, in both the per-batch partial and the merge engine's
    * cross-batch fold (which casts to this stored type). At the 100 TB
    * target an INT running total overflows by construction. */
  private def widenedSumType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case other => other
  }

  /** Pre-aggregate one increment per key: the batch-bounded shuffle whose
    * output the merge engine folds into the stored rollup. */
  def preAggregate(batch: DataFrame, spec: RollupSpec): DataFrame = {
    def sumCol(c: String): Column = spec.decimalSum.get(c) match {
      case Some((p, s)) =>
        sum(col(c).cast(DecimalType(p, s))).cast(DecimalType(p, s))
      case None =>
        sum(col(c)).cast(widenedSumType(batch.schema(c).dataType))
    }
    val aggExprs = spec.aggs.toSeq.sortBy(_._1).map {
      case (c, "sum") => sumCol(c).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, "approx_distinct") => hll_sketch_agg(col(c)).as(c)
      case (c, f) => assert(f == "min"); min(col(c)).as(c)
    } ++ spec.countCol.map(c => count(lit(1)).as(c))
    batch.groupBy(spec.keys.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Read the rollup as its user-facing view: `approx_distinct` sketch
    * columns surface as their BIGINT estimates (exact while the sketch is
    * in its small-cardinality exact mode), everything else as stored. */
  def readView(spark: SparkSession, targetDir: String, spec: RollupSpec): DataFrame = {
    val t = new LakehouseTable(spark, targetDir)
    val sketchCols = spec.aggs.collect { case (c, "approx_distinct") => c }.toSet
    val df = t.read()
    df.select(df.columns.toSeq.map { c =>
      if (sketchCols.contains(c)) hll_sketch_estimate(col(c)).as(c) else col(c)
    }: _*)
  }

  /** Start the standing maintenance query: change feed of `sourceDir` →
    * per-batch pre-aggregate → aggregate-engine MERGE into `targetDir`
    * (created on first batch if missing; its checkpoint lives under the
    * target, underscore-prefixed so reads never see it). */
  def maintain(
      spark: SparkSession,
      sourceDir: String,
      targetDir: String,
      spec: RollupSpec,
      buckets: Int = 16): StreamingQuery = {
    val target = new LakehouseTable(spark, targetDir)
    val ckpt = java.nio.file.Paths.get(targetDir, "_rollup_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", sourceDir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (target.snapshot().meta.isEmpty)
          target.create(
            targetSchema(batch.schema, spec), buckets = buckets,
            mergeEngine = "aggregate",
            aggregations = spec.aggs.map {
              case (c, "approx_distinct") => c -> "hll" // sketches union
              case kv => kv
            } ++ spec.countCol.map(_ -> "sum"))
        val pre = preAggregate(batch, spec)
        target.merge(
          pre,
          pre.limit(0).select(spec.keys.map(col): _*),
          txn = Some((RollupRunId, batchId)))
        ()
      }
      .start()
  }
}
