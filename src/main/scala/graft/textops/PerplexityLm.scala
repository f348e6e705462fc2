package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity filtering (Wenzek et al. 2020): train an n-gram
  * language model on a trusted reference corpus, score every candidate
  * document's tokens under it, and keep the documents the model finds
  * predictable. The reference engine has no LM operator — this is one of the
  * training-data-pipeline additions — but the shape follows the published
  * CCNet pipeline (LM trained on Wikipedia, scores bucketing CommonCrawl
  * into head/middle/tail).
  *
  * The model is a bigram Stupid Backoff LM (Brants et al. 2007): no
  * normalization constants, no discount estimation — exactly the variant
  * built for MapReduce-scale corpora, which is why it fits Spark natively:
  *
  * {{{ s(w2 | w1) = c(w1 w2) / c(w1)        if the bigram was seen
  *                 0.4 * c(w2) / N          else if w2 was seen
  *                 0.4 * 0.4 / N            else (OOV floor)        }}}
  *
  * Scale shape (the 100 TB design):
  *   - training is two hash aggregates (unigram counts, bigram counts) —
  *     map-side partial combine, one shuffle each; the corpus text itself
  *     is never shuffled, only (token, count) pairs;
  *   - scoring explodes candidate docs to (doc_id, w1, w2) bigram
  *     occurrences and hash-joins them against the two count tables on
  *     their token keys — co-keyed shuffle joins (AQE broadcasts the
  *     count tables when the vocabulary is small, as in tests);
  *   - the per-document fold is one hash aggregate keyed by doc_id.
  *     Per-token log terms are rounded then summed as exact DECIMAL so the
  *     result is independent of partitioning / accumulation order.
  */
object PerplexityLm {

  val BackoffAlpha = 0.4

  /** `(unigrams, bigrams, totalTokens)`: token and adjacent-pair counts over
    * the reference corpus. Two aggregates, no joins.
    */
  def train(reference: DataFrame, textCol: String): (DataFrame, DataFrame, Long) = {
    val toks = reference.select(tokens(col(textCol)).as("w"))
    // NOTE (r18 optimization round, measured): eager localCheckpoint of the
    // two count tables was tried and REGRESSED x_perplexity_lm CPU
    // 0.28 → 0.49 s — the reference slice is small relative to the
    // candidate-scoring work, so the two materialization jobs cost more
    // than the re-tokenization they save. At 100 TB a caller with a large
    // trusted corpus can pre-aggregate and persist the count tables
    // themselves (the API takes plain DataFrames). OPTIMIZATION_r18.md.
    val uni = toks.select(explode(col("w")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = toks.select(explode(bigrams(col("w"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val total = uni.agg(sum("c1")).head
    require(!total.isNullAt(0) && total.getLong(0) > 0L,
      "empty reference corpus (no rows, or every text tokenizes to " +
        "nothing) — a language model needs at least one token")
    (uni, bi, total.getLong(0))
  }

  /** Per-document LM score: `(idCol, n_bigrams, lp_avg)` where `lp_avg` is
    * the mean log10 Stupid-Backoff score per bigram, rounded to 6 decimals.
    * Documents with fewer than two tokens carry no evidence and are dropped.
    */
  def score(
      candidates: DataFrame,
      idCol: String,
      textCol: String,
      uni: DataFrame,
      bi: DataFrame,
      totalTokens: Long): DataFrame = {
    val occ = candidates
      .select(col(idCol), explode(bigrams(tokens(col(textCol)))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val n = lit(totalTokens.toDouble)
    // c(w1) for the seen-bigram branch rides the bigram table (denormalized
    // at train time would also work); backoff needs c(w2) from the unigram
    // table. Join keys are the token columns — hash joins, co-keyed.
    val uniW1 = uni.select(col("w1"), col("c1").as("c1_w1"))
    val uniW2 = uni.select(col("w1").as("w2"), col("c1").as("c1_w2"))
    val biC = bi.select(col("w1"), col("w2"), col("c2"))
    val term = when(col("c2").isNotNull,
        col("c2").cast("double") / col("c1_w1"))
      .when(col("c1_w2").isNotNull,
        lit(BackoffAlpha) * col("c1_w2").cast("double") / n)
      .otherwise(lit(BackoffAlpha * BackoffAlpha) / n)
    occ
      .join(biC, Seq("w1", "w2"), "left")
      .join(uniW1, Seq("w1"), "left")
      .join(uniW2, Seq("w2"), "left")
      .select(col(idCol),
        round(log10(term), 6).cast("decimal(18,6)").as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("lp_sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("lp_sum").cast("double") / col("n_bigrams"), 6).as("lp_avg"))
  }

  /** Whitespace tokens, empties dropped — matches the oracle's
    * `list_filter(string_split(text, ' '), x -> x <> '')` exactly. */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Adjacent pairs as `struct(w1, w2)`; empty when fewer than two tokens. */
  def bigrams(w: Column): Column =
    zip_with(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
}
