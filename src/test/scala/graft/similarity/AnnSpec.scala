package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  private lazy val emb = spark.read
    .parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("brute force: self-query returns itself at rank 1 with cosine 1") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Ann.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 3)
    val rank1 = top.filter(col("rank") === 1).collect()
    assert(rank1.length == 5)
    assert(rank1.forall(r => r.getLong(0) == r.getLong(1) && r.getDouble(2) > 0.999999))
  }

  test("IVF: partitioned layout probes with partition pruning and finds self") {
    val idx = Ann.IvfIndex.build(emb, "vec_id", "embedding", numCentroids = 4,
      sampleSize = 200, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/lists"
    idx.writePartitioned(dir)

    // partition pruning is visible in the scan
    val probe = idx.readBuckets(spark, dir, Seq(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("bucket"), s"expected bucket partition filter in: $pf")

    val queries = emb.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val top = idx.topKFromPartitioned(dir, queries, k = 1, nprobe = 1)
    val hits = top.collect()
    assert(hits.length == 5)
    assert(hits.forall(r => r.getLong(0) == r.getLong(1) && r.getDouble(2) > 0.999999))
  }

  test("filtered IVF on disk: BOTH bucket and label partition filters prune") {
    val embL = spark.read
      .parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val idx = Ann.IvfIndex.build(embL, "vec_id", "embedding", numCentroids = 4,
      sampleSize = 200, iters = 2, attrCols = Seq("label"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_attr").toString + "/lists"
    idx.writePartitioned(dir, "label")

    val queries = embL.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.get(2): Any)).toSeq
    val top = idx.topKWithinFromPartitioned(dir, queries, "label", k = 3, nprobe = 4)
    val plan = top.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("bucket"), s"expected bucket partition filter in: $pf")
    assert(pf.contains("label"), s"expected label partition filter in: $pf")

    // exact at full probes: rank-1 self, and every hit shares the query label
    val hits = top.collect()
    assert(hits.filter(_.getInt(3) == 1).forall(r => r.getLong(0) == r.getLong(1)))
    val labels = embL.collect().map(r => r.getLong(0) -> r.get(2)).toMap
    val qLabel = queries.map(q => q._1 -> q._3).toMap
    assert(hits.forall(r => labels(r.getLong(1)) == qLabel(r.getLong(0))))
    // and it equals the in-memory filtered search row for row
    val mem = idx.topKWithin(queries, "label", k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(top.collect().map(_.toSeq).toSet == mem)
  }

  test("IVF-PQ: partition-pruned ADC scan retrieves self at rank 1") {
    val idx = Ann.IvfPqIndex.build(emb, "vec_id", "embedding",
      numCentroids = 4, m = 8, ks = 16, sampleSize = 200, iters = 2)
    val queries = emb.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

    // in-memory: the query's own bucket is its nearest centroid, so nprobe=1
    // always contains it, and ADC is minimized by its own codes
    val top = idx.topK(queries, k = 1, nprobe = 1).collect()
    assert(top.length == 5)
    assert(top.forall(r => r.getLong(0) == r.getLong(1)))

    // on disk: same result off the partitioned layout, with pruning visible
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/lists"
    idx.writePartitioned(dir)
    val fromDisk = idx.topKFromPartitioned(dir, queries, k = 1, nprobe = 1)
    val plan = fromDisk.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("bucket"), s"expected bucket partition filter in: $pf")
    assert(fromDisk.collect().forall(r => r.getLong(0) == r.getLong(1)))

    // the scan never touches raw vectors: the encoded relation is
    // (cid, bucket, codes) — one packed long per vector
    assert(idx.encodings.columns.toSet == Set("cid", "bucket", "codes"))
  }

  test("LSH top-k finds exact self-matches through band buckets") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Ann.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qvec",
      k = 1, dim = 64)
    val hits = top.collect()
    assert(hits.length == 5)
    assert(hits.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
