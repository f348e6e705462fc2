package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // the BPE paper's corpus shape: low×5 lower×2 newest×6 widest×3
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")

  test("learn: merges match the hand-computed classic sequence") {
    val model = Bpe.learn(corpus, "text", numMerges = 6)
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 → lexicographic tie-break picks
    // (e,s) first; then the chain to est</w>; then l-o-w; then (e,w)=6
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encode: unseen word segments into learned subwords, greedy by rank") {
    val model = Bpe.learn(corpus, "text", numMerges = 6)
    assert(model.encodeWord("lowest") == Seq("low", "est</w>"))
    assert(model.encodeWord("low") == Seq("low", "</w>"))
    // no learned pair applies: pure characters + end marker
    assert(model.encodeWord("xyz") == Seq("x", "y", "z", "</w>"))
    assert(model.encodeWord("") == Seq.empty)
    assert(model.encode("  ") == Seq.empty)
    assert(model.encode("Lowest XYZ") ==
      Seq("low", "est</w>", "x", "y", "z", "</w>"))
  }

  test("learn: deterministic, and minFreq stops memorizing rare words") {
    val m1 = Bpe.learn(corpus, "text", numMerges = 50)
    val m2 = Bpe.learn(corpus, "text", numMerges = 50)
    assert(m1 == m2)
    // every pair occurs once: nothing reaches minFreq=2, no merges learned
    val rare = Seq("qwerty").toDF("text")
    assert(Bpe.learn(rare, "text", numMerges = 10).merges.isEmpty)
  }

  test("pinnedGateMerges: exactly what learn derives from the sf0.01 gate corpus") {
    // the x_bpe DuckDB oracle replays encoding against this pinned table;
    // this assertion is what makes the pin self-checking — if learn (or the
    // gate corpus) ever drifts, this fails before the driver's hash compare
    val docsPath = new java.io.File(SparkTestBase.sf001, "documents.parquet")
    assume(docsPath.exists(), s"gate corpus not present at $docsPath")
    val d = spark.read.parquet(docsPath.toString)
    val model = Bpe.learn(d, "text", numMerges = 40)
    assert(model.merges == Bpe.pinnedGateMerges)
  }

  test("encodeTokens expression: map-only column over a learned model") {
    val model = Bpe.learn(corpus, "text", numMerges = 6)
    val out = Seq("lowest", "newest").toDF("t")
      .select(Bpe.encodeTokens($"t", model).as("toks"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("low", "est</w>"))
    assert(out(1) == Seq("n", "ew", "est</w>"))
  }
}
