package graft.streaming

import graft.core.TableSchema
import graft.dedup.Dedup
import graft.sinks.LakehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MINHASH-LSH SIGNATURE-INDEX MAINTENANCE: keep the corpus's
  * banded signature rows fresh as a standing query over the document table's
  * change feed, so the nightly "is this new batch a near-duplicate of
  * anything we already have?" question costs O(batch), never O(corpus
  * re-signature) — the near-dup analog of [[IvfMaintenance]] (vectors) and
  * [[graft.textops.InvertedIndex]] (terms), completing the maintained-index
  * family across the three retrieval modalities.
  *
  * The index stores `(band, bucketKey, id, payload)` — banded signature rows
  * ([[Dedup.bandedSignatures]]), NOT text: verification against history
  * compares signatures (the [[Dedup.minHashLshCandidates]] `sigSim`
  * estimator), so the corpus text is never read again after indexing.
  *
  * Exactly-once: Spark's micro-batch id rides as a `txn` action in the same
  * commit as the signature rows — a crash-replayed batch skips wholesale, so
  * a document's signatures are never indexed twice, never lost
  * (`LshMaintenanceSpec` deletes the checkpoint outright to prove the txn
  * action alone stops replays; the `d_incremental_lsh` gate kills and
  * restarts the maintainer with a commit landing while down).
  *
  * 100 TB shape: per-batch maintenance is map-only over the increment (one
  * signature pass + band explode) plus a range-repartition on
  * `(band, bucketKey)` so data files cover narrow band/bucket ranges. The
  * batch-dedup probe broadcasts the NEW batch's banded rows (bands ×
  * |batch| rows — nightly-batch-sized, not corpus-sized) against a map-only
  * scan of the index: history is never shuffled, never re-signatured — the
  * [[Dedup.incrementalDedup]] scale story lifted from exact to near-dup.
  */
object LshMaintenance {

  /** Run id under which maintenance records Spark's micro-batch id as a
    * `txn` action in the signature table's commits. */
  val LshRunId = "graft-lsh-maintain"

  /** The signature parameters are part of the index's IDENTITY: a probe
    * computed with different (shingleSize, numHashes, bands) produces
    * different payloads and bucket keys, so the (band, bucketKey) join
    * matches NOTHING and every near-duplicate passes as unique with no
    * error. Maintenance persists the parameters beside the table; probes
    * and resumed maintainers refuse a mismatch loudly. */
  private def paramsPath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, "_lsh_params.json")

  private def writeParams(indexDir: String, shingleSize: Int, numHashes: Int,
      bands: Int): Unit =
    java.nio.file.Files.write(paramsPath(indexDir),
      s"""{"shingleSize":$shingleSize,"numHashes":$numHashes,"bands":$bands}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def checkParams(indexDir: String, shingleSize: Int, numHashes: Int,
      bands: Int, what: String): Unit = {
    val p = paramsPath(indexDir)
    if (java.nio.file.Files.exists(p)) {
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(p))
      val stored = (n.get("shingleSize").asInt(), n.get("numHashes").asInt(),
        n.get("bands").asInt())
      require(stored == ((shingleSize, numHashes, bands)),
        s"$what with (shingleSize=$shingleSize, numHashes=$numHashes, " +
          s"bands=$bands) against an index built with (shingleSize=" +
          s"${stored._1}, numHashes=${stored._2}, bands=${stored._3}) — " +
          "the signatures would never match and every near-duplicate " +
          "would silently pass as unique; use the index's parameters")
    }
  }

  /** Start the standing maintenance query over `sourceDir`'s change feed,
    * appending banded signature rows to the index table at `indexDir`. */
  def maintain(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): StreamingQuery = {
    val target = new LakehouseTable(spark, indexDir)
    val ckpt = java.nio.file.Paths.get(indexDir, "_lsh_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", sourceDir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val banded = Dedup.bandedSignatures(
          batch, idCol, textCol, shingleSize, numHashes, bands)
        if (target.snapshot().meta.isEmpty) {
          target.create(TableSchema(banded.schema), buckets = 1)
          writeParams(indexDir, shingleSize, numHashes, bands)
        } else checkParams(indexDir, shingleSize, numHashes, bands,
          "resuming LSH maintenance")
        // range-partition the increment on (band, bucketKey): each data file
        // covers a contiguous band/bucket range, so single-probe lookups
        // prune through the zone maps; bulk batch probes instead broadcast
        // (see dedupAgainstIndex) and read the index map-only
        val partitions = math.min(bands * 4,
          spark.sessionState.conf.numShufflePartitions)
        target.append(
          banded.repartitionByRange(partitions, col("band"), col("bucketKey")),
          txn = Some((LshRunId, batchId)))
        ()
      }
      .start()
  }


  /** Drop members of `newDocs` that near-duplicate an INDEXED document
    * (signature similarity ≥ `threshold` on any shared band bucket) or an
    * earlier member of the same batch (the lower id survives — greedy, as in
    * [[Dedup.minHashNearDuplicates]]). Returns the surviving rows of
    * `newDocs` unchanged.
    *
    * The new batch's banded rows are explicitly `broadcast` — the index side
    * is scanned map-only and never shuffles, whatever its size. Ids must be
    * distinct from indexed ids (new documents, by construction).
    */
  def dedupAgainstIndex(
      spark: SparkSession,
      indexDir: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    checkParams(indexDir, shingleSize, numHashes, bands, "probing the LSH index")
    val newBanded = Dedup.bandedSignatures(
        newDocs, idCol, textCol, shingleSize, numHashes, bands)
      .select(col("band"), col("bucketKey"),
        col("id").as("__new_id"), col("payload").as("__new_payload"))
    val index = new LakehouseTable(spark, indexDir).read()
    val vsIndex = index.join(broadcast(newBanded), Seq("band", "bucketKey"))
      .filter(graft.dedup.Dedup.signatureSimilarity(col("payload"), col("__new_payload"), numHashes) >= threshold)
      .select(col("__new_id").as(idCol))
    // within-batch: candidate pairs among the new docs themselves; the
    // HIGHER id of a verified pair drops (chains resolve greedily: if a~b
    // and b~c, both b and c drop — b's copy already survives as a)
    val vsSelf = Dedup.minHashLshCandidates(
        newDocs, idCol, textCol, shingleSize, numHashes, bands)
      .filter(col("sigSim") >= threshold)
      .select(col("idB").as(idCol))
    newDocs.join(vsIndex.union(vsSelf).distinct(), Seq(idCol), "left_anti")
  }
}
