package graft

import graft.core.{TableId, TableSchema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 optimization invariants (OPTIMIZATION_r18.md) so a later
  * refactor cannot silently regress the plan shapes the round measured:
  *  - LSH self-joins compute the banded-signature subtree ONCE (shared
  *    exchange + runtime reuse), not once per join side;
  *  - model training (NaiveBayes / PerplexityLm) stays LAZY — query
  *    construction launches zero jobs (the eager-checkpoint experiment was
  *    measured SLOWER and reverted; AQE stage reuse already dedups the
  *    identical training exchanges at runtime);
  *  - a lakehouse MERGE commit writes O(touched buckets) files, not
  *    O(write tasks × buckets).
  */
class OptimizationR18Spec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("LSH self-join reuses one banded exchange (signatures computed once)") {
    val vecs = (0L until 200L).map(i =>
      (i, Array.tabulate(8)(d => ((i % 7) + d).toFloat / 8f)))
      .toDF("vec_id", "embedding")
    val out = graft.dedup.Dedup.embeddingNearDuplicates(
      vecs, "vec_id", "embedding", dim = 8, threshold = 0.999)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"banded self-join must share one exchange, got:\n$plan")
  }

  test("minhash near-dup pipeline stays lazy (no eager materialization jobs at build)") {
    // r18 measured an eager localCheckpoint of candidates + shingles at
    // +1.0 CPU-s vs the lazy double-computed verification (OPTIMIZATION_r18
    // §"tried and reverted") — building the query must therefore launch NO
    // Spark jobs; all work happens under the caller's single action.
    val docs = (0L until 40L).map(i => (i, s"w${i % 5} a b c d e f g"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = graft.dedup.Dedup.minHashNearDuplicates(
      docs, "doc_id", "text", threshold = 1.0)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "query construction must not run jobs")
    // semantics: the same-text groups all verify at jaccard 1.0
    val pairs = out.collect()
    assert(pairs.nonEmpty && pairs.forall(_.getDouble(2) == 1.0))
  }

  test("merge commit writes O(touched buckets) files, independent of task count") {
    val dir = java.nio.file.Files.createTempDirectory("opt18_merge").toString
    val t = new graft.sinks.LakehouseTable(spark, dir)
    t.create(
      TableSchema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "k", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField(
            "v", org.apache.spark.sql.types.LongType))),
        primaryKeys = Seq("k")),
      buckets = 8)
    // 10k keys spread over every bucket, written from 4 shuffle partitions:
    // unclustered this commit would carry up to 4 × 8 files
    t.merge(
      spark.range(10000).repartition(4).select(col("id").as("k"), col("id").as("v")),
      spark.range(0).select(col("id").as("k")))
    val files = t.snapshot().files
    assert(files.size <= 8, s"one file per touched bucket expected, got ${files.size}")
    assert(files.map(_.bucket).distinct.size == 8)
    assert(t.read().count() == 10000L)
  }
}
