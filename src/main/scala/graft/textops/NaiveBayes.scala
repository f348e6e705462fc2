package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the count-based sibling of the
  * logistic-regression quality classifiers used to filter pretraining
  * corpora (GPT-3's WebText classifier, CCNet's LM buckets): label documents
  * with a trusted attribute on a seed slice, train on counts, classify the
  * rest. NB is the variant whose training IS two hash aggregates — per-label
  * document counts (priors) and per-(label, token) counts (likelihoods) — so
  * it trains in one pass over any corpus size with only (token, count)
  * pairs ever shuffling.
  *
  * Scoring is exact and order-independent: per-token Laplace-smoothed
  * log10 likelihoods are rounded to 6 decimals and summed as DECIMAL, the
  * prior added once, and the argmax taken over (score DESC, label ASC) — a
  * total order, so Spark and any replay agree bit-for-bit.
  *
  * Scale shape: the model (labels × vocabulary) broadcasts; candidates
  * explode to (id, token) and hash-join the model; the per-document fold is
  * one aggregate keyed by id. No window, no driver loop.
  */
object NaiveBayes {

  /** `(model, labelStats)`:
    * model = (label, w, ll) per-token smoothed log10 likelihood;
    * labelStats = (label, prior, llUnseen) — log10 prior and the
    * smoothed likelihood of a token never seen with that label.
    */
  def train(
      labeled: DataFrame,
      labelCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val toks = labeled.select(col(labelCol).as("label"),
      PerplexityLm.tokens(col(textCol)).as("w"))
    // persisted: vocab count, the model projection, and the per-label
    // totals all read this aggregate — without the cache the corpus is
    // tokenized three times over ("trains in one pass" means one pass)
    val tokenCounts = toks.select(col("label"), explode(col("w")).as("w"))
      .groupBy("label", "w").agg(count(lit(1)).as("c"))
      .persist()
    val vocab = tokenCounts.select(col("w")).distinct().count()
    val docCounts = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("docs"))
    val totalDocs = labeled.count()
    // LEFT join + zero fill: a label whose documents all tokenize to zero
    // tokens has no tokenCounts rows — an inner join would silently drop
    // it from the stats, so zero-token candidates could never classify to
    // it and its prior mass would vanish
    val labelTokens = docCounts.select(col("label"))
      .join(tokenCounts.groupBy("label").agg(sum("c").as("n")), Seq("label"), "left")
      .select(col("label"), coalesce(col("n"), lit(0L)).as("n"))
    // Laplace add-one over the training vocabulary; log10 terms are rounded
    // at TRAIN time so every scorer sees identical per-token constants
    val model = tokenCounts.join(labelTokens, "label")
      .select(col("label"), col("w"),
        round(log10((col("c") + 1).cast("double") / (col("n") + lit(vocab))), 6)
          .cast("decimal(18,6)").as("ll"))
    val stats = docCounts.join(labelTokens, "label")
      .select(col("label"),
        round(log10(col("docs").cast("double") / lit(totalDocs.toDouble)), 6)
          .cast("decimal(18,6)").as("prior"),
        round(log10(lit(1.0) / (col("n") + lit(vocab))), 6)
          .cast("decimal(18,6)").as("llUnseen"))
    // NOTE (r18 optimization round, measured): do NOT eagerly materialize
    // model/stats here. The scoring plan contains the training-aggregate
    // subtree four times, but all four share one canonical exchange
    // (scan→explode→partial-count on (label, w)), so AQE stage reuse
    // computes it ONCE at runtime; an explicit localCheckpoint was tried
    // and REGRESSED x_nb_classify CPU 0.91 → 1.32 s (two extra
    // materialization jobs + serialization for work the runtime already
    // deduplicated). OPTIMIZATION_r18.md has the A/B.
    tokenCounts.unpersist()
    (model, stats)
  }

  /** `(idCol, pred)`: the argmax label per document, ties broken by label
    * ascending. Documents with zero tokens are classified by prior alone.
    */
  def predict(
      candidates: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      labelStats: DataFrame): DataFrame = {
    val occ = candidates
      .select(col(idCol), explode_outer(PerplexityLm.tokens(col(textCol))).as("w"))
    // one model probe per TOKEN, not per token×label (r19, guide §3/§2.3):
    // the model pivots to token → map(label → ll), each occurrence joins it
    // ONCE, and the per-label fan-out happens AFTER the join as a map
    // lookup on the already-attached entry. The previous shape crossed the
    // occurrences with the label list FIRST and probed the (label, token)
    // model |labels|× per occurrence — |labels|× the joined rows, |labels|×
    // the string hashing. Values are identical: per (doc, label) the term
    // multiset is unchanged (w null → 0; label hit in the token's map → ll;
    // token unseen for that label or entirely → llUnseen), and decimal
    // addition is exact, so any association order sums to the same decimal
    // and the argmax is bit-identical (oracle re-proved).
    val tokenModel = model.groupBy(col("w").as("mw"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("label"), col("ll")))))
        .as("mll"))
    val scored = occ
      .join(broadcast(tokenModel), col("w") === col("mw"), "left")
      .crossJoin(broadcast(labelStats))
      .select(col(idCol), col("label"), col("prior"),
        when(col("w").isNull, lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
          .otherwise(coalesce(element_at(col("mll"), col("label")), col("llUnseen")))
          .as("term"))
      .groupBy(idCol, "label")
      .agg(first(col("prior")).as("prior"), sum(col("term")).as("lsum"))
      .select(col(idCol), col("label"), (col("prior") + col("lsum")).as("score"))
    scored
      .groupBy(idCol)
      .agg(min_by(col("label"), struct((-col("score")).as("ns"), col("label")))
        .as("pred"))
  }
}
