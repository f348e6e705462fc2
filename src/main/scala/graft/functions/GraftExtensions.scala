package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** The engine's `SparkSessionExtensions` integration point (SURVEY custom-op
  * preference (c)): registers the native Catalyst expressions as SQL-callable
  * functions, so `spark.sql("SELECT graft_simhash64(text) ...")` works for
  * SQL users exactly like the DataFrame column helpers do for Scala users.
  *
  * Activate with `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CatalystExprs", null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def checked(
      name: String, usage: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${args.length}; usage: " +
            usage.replace("_FUNC_", name))
      build(args)
    }

  private[functions] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_word_shingles", "_FUNC_(text, k) - lowercased word k-grams",
      checked("graft_word_shingles", "_FUNC_(text, k)", 2)(
        args => CatalystExprs.WordShinglesExpr(args.head, intArg(args(1), "k")))),
    ("graft_minhash_sig", "_FUNC_(shingles, numHashes) - one-pass MinHash signature",
      checked("graft_minhash_sig", "_FUNC_(shingles, numHashes)", 2)(
        args => CatalystExprs.MinHashSigExpr(args.head, intArg(args(1), "numHashes")))),
    ("graft_simhash64", "_FUNC_(text) - 64-bit SimHash",
      checked("graft_simhash64", "_FUNC_(text)", 1)(
        args => CatalystExprs.SimHashExpr(args.head))),
    ("graft_dot", "_FUNC_(a, b) - float-array dot product in double",
      checked("graft_dot", "_FUNC_(a, b)", 2)(
        args => CatalystExprs.DotProductExpr(args.head, args(1)))),
    ("graft_word_grams", "_FUNC_(text, k) - strict word k-grams (decontam/dup-span gram set)",
      checked("graft_word_grams", "_FUNC_(text, k)", 2)(
        args => CatalystExprs.StrictWordGramsExpr(args.head, intArg(args(1), "k")))),
    ("graft_repetition_stats",
      "_FUNC_(text) - Gopher repetition signals struct in one pass",
      checked("graft_repetition_stats", "_FUNC_(text)", 1)(
        args => CatalystExprs.RepetitionStatsExpr(args.head))))

  /** Register into an EXISTING session (extensions classes only apply at
    * session creation; `getOrCreate` on a live context ignores
    * `withExtensions`) — same builders, temp-function scope.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
