package graft.streaming

import graft.SparkTestBase
import graft.core.TableSchema
import graft.similarity.Ann
import graft.sinks.LakehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Streaming IVF index maintenance: exactly-once under kill/restart (with a
  * source commit landing while the maintainer is down), replay-skip via the
  * txn action when the CHECKPOINT itself is lost, and zone-map file pruning
  * at probe time — the three properties that make a standing index
  * maintainer trustworthy at 100 TB.
  */
class IvfMaintenanceSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  /** 48 deterministic dim-4 vectors spread over 4 coarse clusters. */
  private def vectors = {
    val rows = (0L until 48L).map { i =>
      val c = (i % 4).toInt // cluster
      (i, Array.tabulate(4)(j =>
        (10f * c + ((i * 7 + j * 3) % 13).toFloat / 13f) * (if (j == c) 1f else 0.1f)))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def newDirs(): (String, String) = (
    Files.createTempDirectory("ivf_m_src").toString,
    Files.createTempDirectory("ivf_m_idx").toString)

  test("kill/restart with a commit while down: index equals the one-shot batch assignment") {
    val e = vectors
    val batchIdx = Ann.IvfIndex.build(e, "vec_id", "embedding",
      numCentroids = 4, sampleSize = 100)
    val cents = batchIdx.centroids.sortBy(_._1).map(_._2)
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(e.schema), buckets = 2)

    src.append(e.filter(col("vec_id") < 16))
    val q1 = IvfMaintenance.maintain(spark, srcRoot, idxRoot, cents,
      "vec_id", "embedding")
    try {
      q1.processAllAvailable()
      src.append(e.filter(col("vec_id") >= 16 && col("vec_id") < 32))
      q1.processAllAvailable()
    } finally q1.stop() // killed

    src.append(e.filter(col("vec_id") >= 32)) // lands while DOWN
    val q2 = IvfMaintenance.maintain(spark, srcRoot, idxRoot, cents,
      "vec_id", "embedding")
    try q2.processAllAvailable() finally q2.stop()

    val index = new LakehouseTable(spark, idxRoot)
    val got = index.read().select(col("cid"), col("bucket"))
    val want = batchIdx.assignments.select(col("cid"), col("bucket"))
    assert(got.count() == 48L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("checkpoint loss: the txn action alone stops replayed batches from double-indexing") {
    val e = vectors
    val batchIdx = Ann.IvfIndex.build(e, "vec_id", "embedding",
      numCentroids = 4, sampleSize = 100)
    val cents = batchIdx.centroids.sortBy(_._1).map(_._2)
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(e.schema), buckets = 2)
    src.append(e.filter(col("vec_id") < 24))
    src.append(e.filter(col("vec_id") >= 24))

    val q1 = IvfMaintenance.maintain(spark, srcRoot, idxRoot, cents,
      "vec_id", "embedding")
    try q1.processAllAvailable() finally q1.stop()
    val index = new LakehouseTable(spark, idxRoot)
    val before = index.latestVersion()
    assert(index.read().count() == 48L)

    // lose the checkpoint: the restarted query re-reads from startingVersion 0
    // and replays batch ids from 0 — only the (runId, batchId) txn guard
    // stands between the replay and a doubled index
    val ckpt = Paths.get(idxRoot, "_ivf_checkpoint")
    Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
    val q2 = IvfMaintenance.maintain(spark, srcRoot, idxRoot, cents,
      "vec_id", "embedding")
    try q2.processAllAvailable() finally q2.stop()

    assert(index.read().count() == 48L, "replayed batches were re-indexed")
    assert(index.read().select("cid").distinct().count() == 48L)
    assert(index.latestVersion() == before)
  }

  test("probe prunes index files through zone maps; full-nprobe top-k is exact") {
    val e = vectors
    val batchIdx = Ann.IvfIndex.build(e, "vec_id", "embedding",
      numCentroids = 4, sampleSize = 100)
    val cents = batchIdx.centroids.sortBy(_._1).map(_._2)
    val (srcRoot, idxRoot) = newDirs()
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(e.schema), buckets = 2)
    src.append(e)
    val q = IvfMaintenance.maintain(spark, srcRoot, idxRoot, cents,
      "vec_id", "embedding")
    try q.processAllAvailable() finally q.stop()

    val index = new LakehouseTable(spark, idxRoot)
    val snap = index.snapshot()
    assert(snap.files.forall(_.stats.contains("bucket")))
    // the range-repartition on (bucket, cid) makes files cover narrow bucket
    // ranges: a single-bucket probe must admit a strict subset of the files
    val admitted = snap.files.count(f =>
      f.stats("bucket").min.toInt <= 0 && 0 <= f.stats("bucket").max.toInt)
    assert(admitted < snap.files.size,
      s"zone maps admitted all ${snap.files.size} files for one probed bucket")

    // full-nprobe probe == brute-force cosine top-3 over the corpus
    val qs = (0L until 4L).map { qid =>
      val v = e.filter(col("vec_id") === qid).head()
        .getSeq[Float](1).map(_.toDouble).toArray
      (qid, v)
    }
    val got = IvfMaintenance.probeTopK(index, cents, qs, k = 3,
      nprobe = cents.length)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val want = Ann.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 4), "vec_id", "embedding", k = 3)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq == want.toSeq)
  }
}
