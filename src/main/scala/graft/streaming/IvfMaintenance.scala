package graft.streaming

import graft.core.TableSchema
import graft.functions.{CatalystExprs, VectorFunctions}
import graft.sinks.LakehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF INDEX MAINTENANCE: keep an inverted-list vector index fresh
  * as a standing query over the vector table's change feed — the production
  * alternative to rebuilding the index per ingest wave. Centroids are FROZEN
  * at build time (train once on a sample, retrain offline when drift
  * accumulates — the FAISS operational model); each increment is assigned to
  * its nearest centroid in one map-only pass and appended to the index table.
  *
  * Exactly-once: Spark's micro-batch id rides as a `txn` action in the same
  * commit as the assigned rows, so a crash-replayed batch skips wholesale —
  * a vector is never indexed twice, never lost (`IvfMaintenanceSpec` kills
  * and resumes the query mid-stream with a commit landing while down).
  *
  * 100 TB shape: per-batch cost is O(increment) — assignment is a codegen'd
  * expression over the batch, never a pass over the index; the only shuffle
  * is a range-repartition of the increment on its bucket id, which makes
  * every data file cover a NARROW bucket range so the file's min/max zone
  * map answers "does this file hold probed buckets?" at probe time. The
  * index table is created with ONE hash bucket: file boundaries then
  * coincide with the range partitions, and pruning is purely zone-map-driven
  * ([[probeTopK]] reads only admitted files — asserted in the spec).
  */
object IvfMaintenance {

  /** Run id under which maintenance records Spark's micro-batch id as a
    * `txn` action in the index table's commits. */
  val IvfRunId = "graft-ivf-maintain"

  /** Start the standing maintenance query over `sourceDir`'s change feed.
    * `centroids` is the frozen codebook (bucket id = array position, the
    * [[graft.similarity.Ann.IvfIndex]] layout); assignments append to the
    * index table at `indexDir` as `(cid, cvec, bucket)`. */
  def maintain(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      centroids: Array[Array[Double]],
      idCol: String,
      vecCol: String): StreamingQuery = {
    require(centroids.nonEmpty, "empty centroid codebook")
    val target = new LakehouseTable(spark, indexDir)
    val ckpt = java.nio.file.Paths.get(indexDir, "_ivf_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", sourceDir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned = batch.select(
          col(idCol).cast("long").as("cid"),
          col(vecCol).as("cvec"),
          CatalystExprs.nearestCentroid(col(vecCol), centroids).as("bucket"))
        if (target.snapshot().meta.isEmpty)
          target.create(TableSchema(assigned.schema), buckets = 1)
        // range-partition the increment on (bucket, cid): each task — hence
        // each data file, with one hash bucket — covers a contiguous bucket
        // range, so its zone map prunes probes; cid as tiebreak spreads a
        // skewed bucket across tasks instead of one straggler
        val partitions = math.min(centroids.length,
          spark.sessionState.conf.numShufflePartitions)
        target.append(
          assigned.repartitionByRange(partitions, col("bucket"), col("cid")),
          txn = Some((IvfRunId, batchId)))
        ()
      }
      .start()
  }

  /** Exact-at-full-`nprobe` top-k probe against the maintained index: prune
    * the index files by the probed bucket ids THROUGH THE ZONE MAPS
    * (`scanWithFilters` with an `In` filter — metadata-only), then score
    * candidates with the codegen'd cosine and keep each query's top `k`.
    * Same contract as `IvfIndex.topKFromPartitioned`, with zone maps doing
    * the work directory-partitioning does there. */
  def probeTopK(
      index: LakehouseTable,
      centroids: Array[Array[Double]],
      queries: Seq[(Long, Array[Double])],
      k: Int,
      nprobe: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val probePairs = queries.flatMap { case (qid, v) =>
      nearestBuckets(centroids, v, nprobe).map(b => (qid, b, v.map(_.toFloat)))
    }
    val probes = probePairs.toDF("qid", "bucket", "qvec")
    // bucket ids were computed DRIVER-side just above: derive the distinct
    // list locally rather than launching a Spark job to collect it back
    val needed = probePairs.map(_._2).distinct.toArray
    val cands = index
      .scanWithFilters(Array("cid", "cvec", "bucket"),
        Array(org.apache.spark.sql.sources.In("bucket",
          needed.map(_.asInstanceOf[Any]))))
      .filter(col("bucket").isin(needed.toSeq: _*)) // exact re-apply post-prune
      .join(broadcast(probes), Seq("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    cands
      .select(col("qid"), col("cid"),
        VectorFunctions.cosine(col("cvec"), col("qvec")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** `nprobe` nearest centroid ids for a query vector (L2, ties to the lower
    * id — the assignment expression's contract). */
  def nearestBuckets(
      centroids: Array[Array[Double]], vec: Array[Double], nprobe: Int): Seq[Int] = {
    require(centroids.forall(_.length == vec.length),
      s"query vector dim ${vec.length} does not match centroid dim " +
        s"${centroids.headOption.map(_.length).getOrElse(0)} — a silent " +
        "truncated distance would return wrong buckets")
    centroids.zipWithIndex
      .map { case (c, i) =>
        var s = 0.0; var j = 0
        while (j < vec.length) { val d = vec(j) - c(j); s += d * d; j += 1 }
        (s, i)
      }
      .sortBy(identity)
      .take(nprobe)
      .map(_._2)
      .toSeq
  }
}
