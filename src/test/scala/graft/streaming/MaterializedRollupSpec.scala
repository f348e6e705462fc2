package graft.streaming

import graft.SparkTestBase
import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MaterializedRollupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import MaterializedRollup.RollupSpec

  private def newSource(): LakehouseTable = {
    val t = new LakehouseTable(spark, Files.createTempDirectory("rollup_src").toString)
    t.create(TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", LongType), StructField("w", DoubleType))),
      primaryKeys = Seq.empty), buckets = 2)
    t
  }

  private val spec = RollupSpec(
    keys = Seq("k"),
    aggs = Map("v" -> "max", "w" -> "sum"),
    countCol = Some("n"),
    decimalSum = Map("w" -> (18, 2)))

  test("spec validation and schema derivation") {
    val src = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType),
      StructField("w", DoubleType)))
    val ts = MaterializedRollup.targetSchema(src, spec)
    assert(ts.primaryKeys == Seq("k"))
    assert(ts.struct.fieldNames.toSeq == Seq("k", "v", "w", "n"))
    assert(ts.struct("k").nullable == false)
    assert(ts.struct("w").dataType == DecimalType(18, 2)) // exact accumulation
    assert(ts.struct("n").dataType == LongType)

    intercept[IllegalArgumentException](RollupSpec(Seq.empty, Map("v" -> "sum")))
    intercept[IllegalArgumentException](RollupSpec(Seq("k"), Map("v" -> "avg")))
    intercept[IllegalArgumentException](RollupSpec(Seq("k"), Map("k" -> "sum")))
    intercept[IllegalArgumentException](
      RollupSpec(Seq("k"), Map("v" -> "max"), decimalSum = Map("v" -> (10, 2))))
    intercept[IllegalArgumentException](
      MaterializedRollup.targetSchema(src, RollupSpec(Seq("missing"), Map("v" -> "sum"))))
  }

  test("rollup tracks the feed across kill/restart and equals a one-shot aggregate") {
    val src = newSource()
    val out = Files.createTempDirectory("rollup_tgt").toString + "/t"
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(pmod(col("id"), lit(7)).as("k"), col("id").as("v"),
        (col("id").cast("double") / 10).as("w"))

    src.append(batch(0, 500)) // exists before the query: backfill
    val q1 = MaterializedRollup.maintain(spark, src.dir, out, spec, buckets = 2)
    try {
      q1.processAllAvailable()
      src.append(batch(500, 900)) // tail phase
      q1.processAllAvailable()
    } finally q1.stop()

    src.append(batch(900, 1300)) // lands while the maintainer is DOWN
    val q2 = MaterializedRollup.maintain(spark, src.dir, out, spec, buckets = 2)
    try q2.processAllAvailable() finally q2.stop()

    val target = new LakehouseTable(spark, out)
    val got = target.read().orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    val want = batch(0, 1300)
      .groupBy($"k")
      .agg(max($"v").as("v"),
        sum($"w".cast("decimal(18,2)")).cast("decimal(18,2)").as("w"),
        count(lit(1)).as("n"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._4)) == want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) => assert(g._3.compareTo(w._3) == 0) }

    // a replayed micro-batch id is skipped wholesale: merging the same
    // batch under an already-recorded txn must not change the rollup
    val v0 = target.latestVersion()
    val pre = MaterializedRollup.preAggregate(
      graft.pipeline.SchemaDerivator.coerce(batch(900, 1300), src.snapshot().schema.struct),
      spec)
    target.merge(pre, pre.limit(0).select($"k"),
      txn = Some((MaterializedRollup.RollupRunId, 0L)))
    assert(target.latestVersion() == v0) // no new commit, no double-count
  }

  test("approx_distinct: sketches union across batches — repeated values count once") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val src = new LakehouseTable(spark, Files.createTempDirectory("hll_src").toString)
    src.create(TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("u", LongType))), primaryKeys = Seq.empty), buckets = 2)
    val out = Files.createTempDirectory("hll_tgt").toString + "/t"
    val hspec = MaterializedRollup.RollupSpec(
      keys = Seq("k"), aggs = Map("u" -> "approx_distinct"), countCol = Some("n"))
    assert(MaterializedRollup.targetSchema(
      src.snapshot().schema.struct, hspec).struct("u").dataType == BinaryType)

    // batches OVERLAP in u per key: a distributive fold would double-count.
    // k=0 sees users 0..59 twice and 60..89 once; k=1 sees 100..119 in all
    // three batches. Distinct = 90 and 20; row counts 150 and 60.
    def b(us: Range, k: Int) = us.toDF("u").select(lit(k.toLong).as("k"), $"u".cast("long").as("u"))
    src.append(b(0 until 60, 0).unionByName(b(100 until 120, 1)))
    val q1 = MaterializedRollup.maintain(spark, src.dir, out, hspec, buckets = 2)
    try {
      q1.processAllAvailable()
      src.append(b(0 until 60, 0).unionByName(b(100 until 120, 1)))
      q1.processAllAvailable()
    } finally q1.stop()
    src.append(b(60 until 90, 0).unionByName(b(100 until 120, 1))) // while DOWN
    val q2 = MaterializedRollup.maintain(spark, src.dir, out, hspec, buckets = 2)
    try q2.processAllAvailable() finally q2.stop()

    val got = MaterializedRollup.readView(spark, out, hspec)
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 90L, 150L), (1L, 20L, 60L)))

    intercept[IllegalArgumentException](
      MaterializedRollup.RollupSpec(Seq("k"), Map("u" -> "hll"))) // spec-level name is approx_distinct
    intercept[IllegalArgumentException]( // table-level hll requires BINARY
      new LakehouseTable(spark, Files.createTempDirectory("hll_bad").toString)
        .create(TableSchema(
          StructType(Seq(StructField("k", LongType, nullable = false),
            StructField("u", LongType))), primaryKeys = Seq("k")),
          mergeEngine = "aggregate", aggregations = Map("u" -> "hll")))
  }
}
