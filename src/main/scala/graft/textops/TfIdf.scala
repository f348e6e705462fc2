package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the corpus-statistics primitive behind
  * keyword tagging, topic labeling, and sparse retrieval over a document
  * store. Two hash aggregates build the statistics (term frequencies keyed
  * by (doc, token); document frequencies keyed by token — only counts ever
  * shuffle), one join attaches IDF (vocabulary-sized — AQE broadcasts it at
  * any realistic vocab/corpus ratio), and the per-document top-k is a
  * bounded fold: `collect_list` holds one entry per DISTINCT token of that
  * document (not per occurrence), sorted and sliced in place — no window,
  * no global sort.
  *
  * Determinism: scores are rounded then carried as DECIMAL, and ranking
  * orders by (score DESC, term ASC) — a total order any engine replays.
  */
object TfIdf {

  /** `(idCol, rank, term, score)`: the top-`k` terms per document by
    * smoothed TF-IDF (`tf * log10((N+1)/(df+1))`), rank starting at 1.
    */
  def topTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val n = docs.count()
    val tf = docs
      .select(col(idCol), explode(PerplexityLm.tokens(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "w")
      .select(col(idCol), col("w"),
        round(col("tf") * log10(lit(n + 1.0) / (col("df") + 1)), 6)
          .cast("decimal(18,6)").as("s"))
    scored
      .groupBy(idCol)
      .agg(slice(array_sort(collect_list(struct((-col("s")).as("ns"), col("w")))),
        1, k).as("top"))
      .select(col(idCol), posexplode(col("top")))
      .select(col(idCol), (col("pos") + 1).as("rank"),
        col("col.w").as("term"), (-col("col.ns")).cast("double").as("score"))
  }
}
