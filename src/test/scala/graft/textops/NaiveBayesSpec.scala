package graft.textops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def labeled = Seq(
    ("spam", "buy pills now"),
    ("spam", "buy now"),
    ("ham", "meeting at noon"),
    ("ham", "lunch at noon")).toDF("label", "text")

  test("train: smoothed likelihoods and priors are the textbook values") {
    val (model, stats) = NaiveBayes.train(labeled, "label", "text")
    // vocab = 7 distinct tokens; spam has 5 tokens, ham has 6
    val ll = model.as[(String, String, java.math.BigDecimal)].collect()
      .map { case (l, w, v) => (l, w) -> v.doubleValue }.toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ll(("spam", "buy")) == r6(math.log10(3.0 / 12.0)))  // (2+1)/(5+7)
    assert(ll(("ham", "noon")) == r6(math.log10(3.0 / 13.0)))  // (2+1)/(6+7)
    val st = stats.as[(String, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map { case (l, p, u) => l -> (p.doubleValue, u.doubleValue) }.toMap
    assert(st("spam")._1 == r6(math.log10(0.5)))
    assert(st("spam")._2 == r6(math.log10(1.0 / 12.0)))
    assert(st("ham")._2 == r6(math.log10(1.0 / 13.0)))
  }

  test("predict: argmax, unseen-token fallback, zero-token doc scores by prior") {
    val (model, stats) = NaiveBayes.train(labeled, "label", "text")
    val preds = NaiveBayes.predict(
      Seq((1L, "buy pills"), (2L, "lunch at noon"), (3L, "zzz qqq"), (4L, ""))
        .toDF("doc_id", "text"),
      "doc_id", "text", model, stats)
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "spam")
    assert(preds(2L) == "ham")
    // all-unseen tokens: llUnseen(spam) = 1/12 > 1/13 = llUnseen(ham) and
    // priors are equal, so spam wins on the fallback terms alone
    assert(preds(3L) == "spam")
    // zero tokens: equal priors, tie broken by label ascending
    assert(preds(4L) == "ham")
  }

  test("prediction is deterministic across partitionings (decimal fold)") {
    val (model, stats) = NaiveBayes.train(labeled, "label", "text")
    val cand = (0L until 50L).map(i => (i, "buy lunch at noon now")).toDF("doc_id", "text")
    val a = NaiveBayes.predict(cand.repartition(1), "doc_id", "text", model, stats)
      .as[(Long, String)].collect().toMap
    val b = NaiveBayes.predict(cand.repartition(7), "doc_id", "text", model, stats)
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("plan: no CartesianProduct; label cross is a broadcast") {
    val (model, stats) = NaiveBayes.train(labeled, "label", "text")
    val df = NaiveBayes.predict(
      Seq((1L, "buy pills")).toDF("doc_id", "text"), "doc_id", "text", model, stats)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Broadcast"), s"label stats should broadcast:\n$plan")
  }
}
