package graft.textops

import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** INVERTED TEXT INDEX over a document table, maintained as a standing query
  * on the table's change feed: the secondary-index capability (Paimon file
  * indexes / Hudi record index family) that answers "which documents contain
  * this term?" without ever scanning the corpus — the workhorse query of
  * corpus curation ("find everything mentioning X") that a 100 TB text table
  * cannot serve by `LIKE`.
  *
  * Layout: posting pairs `(term, doc_id)` in a PK-less lakehouse append
  * table. Each increment's postings are range-repartitioned on `(term,
  * doc_id)` so every data file covers a NARROW lexicographic term range —
  * the string zone maps then answer "can this file hold the probed term?" —
  * and the table declares a bloom sidecar on `term` for the probes the
  * min/max bands admit anyway (a rare term lands inside almost every file's
  * [min,max] after many commits, but lives in few blooms). A probe reads
  * only admitted files: cost is O(posting list), not O(index).
  *
  * Exactly-once: Spark's micro-batch id rides as a `txn` action in the same
  * commit as the postings (the [[graft.streaming.IvfMaintenance]] /
  * [[graft.streaming.MaterializedRollup]] discipline): a crash-replayed
  * batch skips wholesale, a document is never indexed twice.
  *
  * Tokenization is deliberately elementary and SQL-replicable (lowercase
  * maximal `[a-z0-9]+` runs, distinct per document): the index structure,
  * not the analyzer, is the point. Swap [[postings]] for a BPE or
  * language-aware analyzer without touching maintenance or probes.
  */
object InvertedIndex {

  /** Run id under which maintenance records Spark's micro-batch id as a
    * `txn` action in the index table's commits. */
  val IndexRunId = "graft-inverted-index"

  /** The `(term, df)` dictionary table maintained alongside the postings —
    * the vocabulary, Heaps'-law small (per-batch document frequencies; total
    * df = SUM over appends, vocabulary = DISTINCT term). Fuzzy lookup's
    * candidate scan reads THIS, never the posting table: vocabulary-sized
    * beats index-sized by orders of magnitude at 100 TB. Lives under the
    * index root (underscore-prefixed like the checkpoint dir; the table
    * format lists files from log actions, so the nested root is inert). */
  def dictionaryTable(spark: SparkSession, indexDir: String): LakehouseTable =
    new LakehouseTable(spark, java.nio.file.Paths.get(indexDir, "_dict").toString)

  /** Create-if-absent + exactly-once append of one increment's `(term, df)`
    * rows; same txn discipline as the postings append (each table's log
    * tracks the batch id independently, so a crash between the two appends
    * replays the batch and each table skips or applies on its own). */
  private def appendDictionary(
      dict: LakehouseTable, p: DataFrame, batchId: Long): Unit = {
    if (dict.snapshot().meta.isEmpty)
      dict.create(
        TableSchema(
          StructType(Seq(
            StructField("term", StringType, nullable = false),
            StructField("df", LongType, nullable = false))),
          primaryKeys = Seq.empty),
        buckets = 1)
    dict.append(
      p.groupBy(col("term")).agg(count(lit(1)).as("df")),
      txn = Some((IndexRunId, batchId)))
    ()
  }

  /** Distinct `(term, doc_id)` posting pairs of one document batch: one
    * map-side pass — lowercase, split on non-alphanumeric runs, de-dup
    * within the document (posting lists record membership, not frequency).
    */
  def postings(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(
        col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(filter(
          split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)))
          .as("term"))
      .select(col("term"), col("doc_id"))

  /** The shared maintainer scaffold: the standing change-feed query with
    * the exactly-once txn discipline, create-if-absent with a `term` bloom
    * sidecar, one localCheckpoint per increment (the postings feed both
    * the index and the dictionary), and the (term, doc_id) range
    * partitioning that gives files narrow term ranges while the doc_id
    * tiebreak spreads a skewed term (a stopword in every document) across
    * tasks. Both the plain and the positional maintainer are this scaffold
    * with a different schema + postings function — one definition, so the
    * txn/partitioning/bloom discipline cannot drift between them. */
  private def maintainWith(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      indexSchema: StructType,
      postingsOf: DataFrame => DataFrame): StreamingQuery = {
    val target = new LakehouseTable(spark, indexDir)
    val ckpt = java.nio.file.Paths.get(indexDir, "_invidx_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", sourceDir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (target.snapshot().meta.isEmpty)
          target.create(
            TableSchema(indexSchema, primaryKeys = Seq.empty),
            buckets = 1, // file boundaries == range partitions: zone maps rule
            bloomColumns = Seq("term"))
        val p = postingsOf(batch).localCheckpoint()
        val partitions = spark.sessionState.conf.numShufflePartitions
        target.append(
          p.repartitionByRange(partitions, col("term"), col("doc_id")),
          txn = Some((IndexRunId, batchId)))
        appendDictionary(dictionaryTable(spark, indexDir), p, batchId)
        ()
      }
      .start()
  }

  /** Start the standing maintenance query over `sourceDir`'s change feed,
    * appending each increment's postings to the index table at `indexDir`. */
  def maintain(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      idCol: String,
      textCol: String): StreamingQuery =
    maintainWith(spark, sourceDir, indexDir,
      StructType(Seq(
        StructField("term", StringType, nullable = false),
        StructField("doc_id", LongType, nullable = false))),
      postings(_, idCol, textCol))

  /** Distinct `(term, doc_id, positions)` postings with token positions
    * (0-based, sorted): the positional layout phrase queries need. One
    * tokenize pass + one batch-bounded aggregate per increment. */
  def positionalPostings(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(
        col(idCol).cast("long").as("doc_id"),
        posexplode(filter(
          split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)))
      .groupBy(col("col").as("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("term"), col("doc_id"), col("positions"))

  /** Start a standing POSITIONAL index maintainer: same exactly-once /
    * range-partitioned / bloom-sidecar layout as [[maintain]], with a
    * per-posting position list — the Lucene positional-postings shape that
    * makes phrase queries a posting-list intersection, not a corpus scan. */
  def maintainPositional(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      idCol: String,
      textCol: String): StreamingQuery =
    maintainWith(spark, sourceDir, indexDir,
      StructType(Seq(
        StructField("term", StringType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("positions", ArrayType(IntegerType), nullable = false))),
      positionalPostings(_, idCol, textCol))

  /** Documents containing `terms` CONSECUTIVELY (a phrase query) against a
    * positional index: probe each term's (pruned) posting list, inner-join
    * the candidates on doc_id — membership of every term is necessary —
    * then verify adjacency by folding position sets: carry the phrase-end
    * positions and intersect their successors with the next term's
    * positions. All array ops are codegen'd column expressions over rows
    * bounded by the probed posting lists; the corpus is never touched. */
  def phrase(index: LakehouseTable, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phrase query needs at least one term")
    val lists = terms.zipWithIndex.map { case (t, i) =>
      index.readWhere("term", t)
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = lists.reduce(_.join(_, "doc_id"))
    val ends = (1 until terms.size).foldLeft(col("__p0")) { (acc, i) =>
      array_intersect(transform(acc, x => x + 1), col(s"__p$i"))
    }
    joined.filter(size(ends) > 0).select("doc_id")
  }

  /** Documents containing `term`: a zone-map + bloom pruned point probe —
    * only files whose term range (and bloom) admit the term are read. */
  def lookup(index: LakehouseTable, term: String): DataFrame =
    index.readWhere("term", term).select("doc_id")

  /** Documents containing any term within `maxDist` edits of `term`
    * (typo-tolerant lookup): match the query against the index VOCABULARY
    * first — `levenshtein` over the maintained `(term, df)` dictionary
    * table, a vocabulary-sized scan, orders of magnitude below the posting
    * count (Heaps' law; falls back to `distinct()` over the postings only
    * for indexes built before the dictionary existed) — then union the
    * matched terms' pruned posting probes. The driver-side candidate list
    * is capped LOUDLY at `maxCandidates`: a short query term at maxDist ≥ 2
    * can match a large vocabulary slice, and an unbounded collect + probe
    * union must fail with a clear message, not an OOM. Returns
    * `(term, doc_id)` so callers can weight exact vs fuzzy hits. */
  def lookupFuzzy(
      index: LakehouseTable,
      term: String,
      maxDist: Int = 1,
      maxCandidates: Int = 10000): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val dict = dictionaryTable(SparkSession.active, index.dir)
    val vocab =
      if (dict.snapshot().meta.nonEmpty) dict.read().select(col("term")).distinct()
      else index.read().select(col("term")).distinct()
    val cands = vocab
      // cheap length band cut before the quadratic edit-distance
      .filter(abs(length(col("term")) - lit(term.length)) <= maxDist)
      .filter(levenshtein(col("term"), lit(term)) <= maxDist)
      // bound BEFORE collecting: an unbounded collect of a huge fuzzy
      // vocabulary match would OOM the driver before the guard below fires
      .limit(maxCandidates + 1)
      .collect().map(_.getString(0)).sorted // matched vocabulary: tiny
    require(cands.length <= maxCandidates,
      s"fuzzy lookup for '$term' (maxDist=$maxDist) matched ${cands.length} " +
        s"vocabulary terms (> maxCandidates=$maxCandidates): narrow the query " +
        "or raise maxCandidates")
    cands
      .map(t => index.readWhere("term", t).select(lit(t).as("term"), col("doc_id")))
      .reduceOption(_ unionByName _)
      .getOrElse(index.read().select(col("term"), col("doc_id")).limit(0))
  }

  /** Documents containing ALL of `terms` (conjunctive query): per-term
    * pruned probes, then an intersection by posting count — each probe's
    * cost is its posting list, and the intersection shuffles only posting
    * pairs of the probed terms, never the corpus. */
  def lookupAll(index: LakehouseTable, terms: Seq[String]): DataFrame = {
    val distinctTerms = terms.distinct
    require(distinctTerms.nonEmpty, "conjunctive lookup needs at least one term")
    distinctTerms.map(t => lookup(index, t))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === distinctTerms.size)
      .select("doc_id")
  }
}
