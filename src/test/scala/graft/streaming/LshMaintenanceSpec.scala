package graft.streaming

import graft.SparkTestBase
import graft.core.TableSchema
import graft.dedup.Dedup
import graft.sinks.LakehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Maintained MinHash-LSH signature index: replay-skip via the txn action
  * when the checkpoint is lost, batch dedup against the index (signatures
  * only — history text never re-read), and the broadcast-probe plan shape.
  * The kill/restart-with-commit-while-down path is the `d_incremental_lsh`
  * gate's job.
  */
class LshMaintenanceSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  /** deterministic toy corpus: 24 docs, 12 distinct word streams. */
  private def corpus = (0L until 24L).map { i =>
    (i, (0 until 30).map(j => s"w${i % 12}x${(j * 7 + i % 12) % 17}").mkString(" "))
  }.toDF("doc_id", "text")

  private def newDirs(): (String, String) = (
    Files.createTempDirectory("lsh_m_src").toString,
    Files.createTempDirectory("lsh_m_idx").toString)

  test("checkpoint loss: the txn action alone stops replayed batches") {
    val d = corpus
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)
    src.append(d.filter($"doc_id" < 12))
    src.append(d.filter($"doc_id" >= 12))

    val q1 = LshMaintenance.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q1.processAllAvailable() finally q1.stop()
    val index = new LakehouseTable(spark, idxRoot)
    val n = index.read().count()
    assert(n == 24L * 8, "8 banded rows per doc")

    val ckpt = Paths.get(idxRoot, "_lsh_checkpoint")
    Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
    val q2 = LshMaintenance.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q2.processAllAvailable() finally q2.stop()
    assert(index.read().count() == n, "replayed batches must skip via txn")
    assert(index.read().exceptAll(
      Dedup.bandedSignatures(d, "doc_id", "text")).isEmpty)
  }

  test("dedupAgainstIndex: copy drops, disjoint survives, pair keeps lower id") {
    val d = corpus
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)
    src.append(d)
    val q = LshMaintenance.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q.processAllAvailable() finally q.stop()

    val pairText = (0 until 30).map(j => s"pairword$j").mkString(" ")
    val newBatch = Seq(
      (100L, corpus.filter($"doc_id" === 5L).head().getString(1)), // exact copy
      (101L, (0 until 30).map(j => s"fresh$j").mkString(" ")),     // disjoint
      (102L, pairText),                                            // within-batch
      (103L, pairText))                                            //   duplicate
      .toDF("doc_id", "text")
    val survivors = LshMaintenance.dedupAgainstIndex(
      spark, idxRoot, newBatch, "doc_id", "text", threshold = 1.0)
    assert(survivors.select("doc_id").as[Long].collect().toSet == Set(101L, 102L))
  }

  test("batch probe broadcasts the new side; the index scan never shuffles") {
    val d = corpus
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)
    src.append(d)
    val q = LshMaintenance.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q.processAllAvailable() finally q.stop()

    val newBatch = Seq((200L, "some new words entirely")).toDF("doc_id", "text")
    val survivors = LshMaintenance.dedupAgainstIndex(
      spark, idxRoot, newBatch, "doc_id", "text", threshold = 1.0)
    survivors.collect()
    val plan = survivors.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"index probe must broadcast the new batch's banded rows:\n$plan")
  }
}
