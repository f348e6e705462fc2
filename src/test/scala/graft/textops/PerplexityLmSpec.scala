package graft.textops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerplexityLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ref = Seq(
    "the cat sat",            // bigrams: (the,cat) (cat,sat)
    "the cat ran",            // (the,cat) (cat,ran)
    "a dog ran").toDF("text") // (a,dog) (dog,ran)

  test("train: unigram/bigram counts and token total") {
    val (uni, bi, n) = PerplexityLm.train(ref, "text")
    assert(n == 9)
    val u = uni.as[(String, Long)].collect().toMap
    assert(u("the") == 2 && u("cat") == 2 && u("ran") == 2 && u("dog") == 1)
    val b = bi.select(concat_ws(" ", col("w1"), col("w2")), col("c2"))
      .as[(String, Long)].collect().toMap
    assert(b("the cat") == 2 && b("cat sat") == 1 && b("dog ran") == 1)
    assert(!b.contains("sat the"), "bigrams must not cross document bounds")
  }

  test("score: all three branches — seen bigram, unigram backoff, OOV floor") {
    val (uni, bi, n) = PerplexityLm.train(ref, "text")
    val cand = Seq(
      (1L, "the cat"),   // seen bigram: c2/c1(the) = 2/2 = 1 → log10 = 0
      (2L, "cat dog"),   // unseen bigram, dog seen: 0.4 * 1/9
      (3L, "cat zebra"), // zebra OOV: 0.16/9
      (4L, "solo")       // <2 tokens → dropped
    ).toDF("doc_id", "text")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = PerplexityLm.score(cand, "doc_id", "text", uni, bi, n)
      .as[(Long, Long, Double)].collect()
      .map { case (k, nb, lp) => k -> ((nb, lp)) }.toMap
    assert(!out.contains(4L), "single-token doc carries no bigram evidence")
    assert(out(1L) == ((1L, 0.0)))
    assert(out(2L)._2 == r6(math.log10(0.4 / 9.0)))
    assert(out(3L)._2 == r6(math.log10(0.16 / 9.0)))
  }

  test("score is partitioning-independent (exact decimal fold)") {
    val (uni, bi, n) = PerplexityLm.train(ref, "text")
    val text = Array.fill(200)(Seq("the", "cat", "sat", "zebra", "a", "dog"))
      .flatten.mkString(" ")
    val cand = Seq((7L, text)).toDF("doc_id", "text")
    val a = PerplexityLm.score(cand.repartition(1), "doc_id", "text", uni, bi, n)
      .collect().head
    val b = PerplexityLm.score(cand.repartition(13), "doc_id", "text", uni, bi, n)
      .collect().head
    assert(a == b, s"$a vs $b")
  }

  test("plan: scoring fold is a hash aggregate with map-side partials, no cartesian") {
    val (uni, bi, n) = PerplexityLm.train(ref, "text")
    val cand = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val df = PerplexityLm.score(cand, "doc_id", "text", uni, bi, n)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"per-doc fold must combine map-side:\n$plan")
  }
}
