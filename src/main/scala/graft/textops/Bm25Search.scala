package graft.textops

import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** BM25 RANKED SEARCH over a document table: the classic Robertson/Spärck
  * Jones ranking (the Lucene/Elasticsearch default) served from lakehouse
  * tables maintained over the table's change feed — ranked corpus retrieval
  * without an external search cluster, the query-side complement of
  * [[InvertedIndex]]'s boolean lookups.
  *
  * Two tables under one root, maintained by ONE standing query:
  *  - `root/postings` — `(term, doc_id, tf)` with term frequency, range-
  *    partitioned by term (narrow per-file term bands → zone-map-pruned
  *    probes, bloom sidecar for the bands' false admits);
  *  - `root/doclen` — `(doc_id, len)`, the per-document token count BM25's
  *    length normalization needs.
  * Both appends carry the same micro-batch `txn` action (separate logs, so
  * a crash between the two appends replays the batch and each table skips
  * or applies independently — both converge to exactly-once).
  *
  * Query cost at 100 TB: probe the query terms' posting lists (pruned,
  * O(Σ posting list)), broadcast-join the candidate doc set against the
  * doclen table, score, top-k. The corpus itself is never touched. Corpus
  * constants (N, avgdl) are one slim aggregate over `doclen` — cache the
  * two numbers between queries in a real serving path.
  *
  * Tokenization is [[InvertedIndex.postings]]' analyzer (lowercase
  * `[a-z0-9]+` runs), SQL-replicable so the ranking is oracle-checkable
  * end to end: score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl)),
  * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
  */
object Bm25Search {

  val Bm25RunId = "graft-bm25"

  private def tables(spark: SparkSession, rootDir: String): (LakehouseTable, LakehouseTable) = (
    new LakehouseTable(spark, java.nio.file.Paths.get(rootDir, "postings").toString),
    new LakehouseTable(spark, java.nio.file.Paths.get(rootDir, "doclen").toString))

  /** Tokens of one batch, NOT de-duplicated: `(doc_id, term)` per occurrence. */
  private def tokens(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(
      col(idCol).cast("long").as("doc_id"),
      explode(filter(
        split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)).as("term"))

  /** Start the standing maintenance query: each increment appends its
    * `(term, doc_id, tf)` postings and `(doc_id, len)` lengths. */
  def maintain(
      spark: SparkSession,
      sourceDir: String,
      rootDir: String,
      idCol: String,
      textCol: String): StreamingQuery = {
    val (postings, doclen) = tables(spark, rootDir)
    val ckpt = java.nio.file.Paths.get(rootDir, "_bm25_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", sourceDir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // each table's creation gates on ITS OWN meta: a crash between the
        // two create() calls must leave a recoverable state (a shared gate
        // on postings alone would skip doclen.create forever after restart)
        if (postings.snapshot().meta.isEmpty) {
          postings.create(TableSchema(StructType(Seq(
            StructField("term", StringType, nullable = false),
            StructField("doc_id", LongType, nullable = false),
            StructField("tf", LongType, nullable = false))),
            primaryKeys = Seq.empty), buckets = 1, bloomColumns = Seq("term"))
        }
        if (doclen.snapshot().meta.isEmpty) {
          doclen.create(TableSchema(StructType(Seq(
            StructField("doc_id", LongType, nullable = false),
            StructField("len", LongType, nullable = false))),
            primaryKeys = Seq.empty), buckets = 1)
        }
        // one tokenize pass feeds both aggregates; both are O(increment)
        val toks = tokens(batch, idCol, textCol).localCheckpoint()
        val tf = toks.groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
        val partitions = spark.sessionState.conf.numShufflePartitions
        postings.append(
          tf.repartitionByRange(partitions, col("term"), col("doc_id")),
          txn = Some((Bm25RunId, batchId)))
        doclen.append(
          toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len")),
          txn = Some((Bm25RunId, batchId)))
        ()
      }
      .start()
  }

  /** Top-`k` documents for `terms` by BM25, `(doc_id, score, rank)`.
    * Deterministic: ties break toward the lower doc_id. */
  def search(
      spark: SparkSession,
      rootDir: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (postings, doclen) = tables(spark, rootDir)
    // normalize through the INDEX analyzer (lowercase [a-z0-9]+ runs): the
    // postings only ever store analyzed tokens, so an uppercase or
    // punctuated query term would silently match nothing
    val qTerms = terms
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+"))
      .filter(_.nonEmpty)
      .distinct
    require(qTerms.nonEmpty, "BM25 search needs at least one term")
    val lists = qTerms
      .map(t => postings.readWhere("term", t)) // zone-map + bloom pruned
      .reduce(_ unionByName _)
    val lens = doclen.read()
    val stats = lens.agg(
      count(lit(1)).as("n_docs"), avg(col("len")).as("avgdl"))
    val df_ = lists.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = lists
      .join(broadcast(df_), Seq("term"))
      .join(lens, Seq("doc_id")) // candidates × doclen: posting-list-sized
      .crossJoin(broadcast(stats))
    val idf: Column = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm: Column = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / col("avgdl")))
    // per-doc score: fold the per-term scores in TERM-ASCENDING order (an
    // unordered sum(s) leaves the IEEE association order to partitioning,
    // so two engines — or two runs — can disagree below the rounding
    // quantum), then round BEFORE ranking so the rank tiebreak never
    // depends on sub-rounding noise; the single-partition window is
    // candidate-set-sized (bounded by the probed posting lists), never
    // corpus-sized
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .select(col("doc_id"), col("term"), (idf * norm).as("s"))
      .groupBy(col("doc_id"))
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score_raw"))
      .withColumn("score", round(col("score_raw"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("score"), col("rank"))
  }
}
