package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Learned byte-pair-encoding tokenization (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909) — the real merge-learning algorithm, not the regex
  * approximation in [[TextFunctions.subwordCountApprox]].
  *
  * Scale split, as in production subword trainers: the CORPUS-sized work —
  * word counting — is one distributed hash aggregate (shuffle on word), and
  * the top-`vocabLimit` word-frequency table it produces is METADATA-sized
  * (50k words by default, the fastText/sentencepiece regime; bounded by
  * construction, so the collect can never row-scale with the corpus). Merge
  * learning then runs exactly on that table driver-side, and encoding ships
  * the learned ranks back to executors inside a map-only expression. A
  * 100 TB corpus changes the size of the aggregate's input, never the size
  * of what the driver holds.
  *
  * Determinism: vocabulary ties break by word, merge-count ties by pair
  * (lexicographic) — the same corpus always learns the same model.
  */
object Bpe {

  /** End-of-word marker, a separate final symbol as in the BPE paper. */
  val EndOfWord = "</w>"

  /** An ordered merge table; rank = position. */
  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy lowest-rank-first merging of one word (the standard BPE
      * inference loop): repeatedly merge every occurrence of the
      * best-ranked adjacent pair until no learned pair remains.
      */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var bestPair: (String, String) = null
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bestPair = (syms(i), syms(i + 1)) }
          i += 1
        }
        if (bestPair == null) done = true
        else {
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == bestPair._1 && syms(j + 1) == bestPair._2) {
              out += syms(j) + syms(j + 1); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }

    /** Whitespace-split, lowercased, per-word greedy encoding. */
    def encode(text: String): Seq[String] = {
      // Locale.ROOT: learn() lowercases with Spark's locale-independent
      // lower(); a default-locale toLowerCase here would diverge on a
      // Turkish-locale JVM (dotless I) and the learned merges would never
      // match the encoder's tokens
      val t = text.trim.toLowerCase(java.util.Locale.ROOT)
      if (t.isEmpty) Seq.empty
      else t.split("\\s+").toSeq.flatMap(encodeWord)
    }
  }

  /** Learn `numMerges` merges from a text column. One distributed word-count
    * aggregate bounds the vocabulary to the top `vocabLimit` words (ties by
    * word, so the cut is deterministic); the classic learning loop then runs
    * on that bounded table. Merging stops early when the best pair's
    * frequency falls below `minFreq` — merges memorizing a single rare word
    * carry no generalization.
    */
  def learn(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      vocabLimit: Int = 50000,
      minFreq: Long = 2L): BpeModel = {
    val vocabRows = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabLimit)
      .collect()
    var vocab: Array[(Array[String], Long)] = vocabRows.map { r =>
      (r.getString(0).map(_.toString).toArray :+ EndOfWord, r.getLong(1))
    }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + freq
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties by pair — deterministic across runs and JVMs
        val (pair, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minFreq) exhausted = true
        else {
          merges += pair
          vocab = vocab.map { case (syms, freq) =>
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                out += syms(j) + syms(j + 1); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), freq)
          }
        }
      }
      m += 1
    }
    BpeModel(merges.result())
  }

  /** The merge table `learn` derives from the sf0.01 `documents` gate corpus
    * at `numMerges = 40`, pinned so the DuckDB oracle for `x_bpe` can replay
    * greedy encoding against the exact same model (the merge-learning loop is
    * iterative aggregate-and-rewrite, not single-query SQL, so the oracle
    * takes the deterministic learned table as input instead). Pinning is to
    * the GATE corpus by necessity — the synthetic documents differ per scale
    * factor — and is self-checking twice over: `BpePinnedSpec` re-learns from
    * the sf0.01 parquet and asserts equality, and the driver's hash compare
    * fails if the runtime `learn` in the gate query ever drifts from this
    * table. 40 merges (not the full ~200 that exhausts the 31-word synthetic
    * vocabulary) keeps encoding genuinely partial — per-word token counts
    * range 1–6 — so the gate is sensitive to merge ranking, not just word
    * counting.
    */
  val pinnedGateMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
    ("r", "ow</w>"), ("at", "c"), ("atc", "h</w>"), ("b", "atch</w>"),
    ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"), ("c", "o"),
    ("c", "u"), ("co", "lu"), ("colu", "m"), ("colum", "n</w>"),
    ("cu", "st"), ("cust", "o"), ("custo", "m"), ("custom", "er</w>"))

  /** Subword tokens of `text` under a learned model — map-only; the model
    * rides to executors inside the expression (one deserialization per
    * task, not per row). `CodegenFallback` is deliberate: the greedy merge
    * loop has no profitable codegen form, and the expression sits in
    * map-only projections where the fallback boundary costs one virtual
    * call per row.
    */
  def encodeTokens(text: Column, model: BpeModel): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), model))

  case class BpeEncodeExpr(child: Expression, model: BpeModel)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        model.encode(input.asInstanceOf[UTF8String].toString)
          .map(UTF8String.fromString).toArray[Any])
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
