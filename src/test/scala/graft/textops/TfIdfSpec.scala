package graft.textops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  test("textbook scores: rare repeated terms rank above common ones") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // doc 1: apple tf=2 df=1 -> 2*log10(4/2); banana tf=1 df=2 -> log10(4/3)
    assert(out(1L) == Seq(
      ("apple", r6(2 * math.log10(4.0 / 2.0))),
      ("banana", r6(math.log10(4.0 / 3.0)))))
    // doc 3: cherry tf=3 df=2; date tf=1 df=1
    assert(out(3L).head._1 == "cherry")
    assert(out(3L)(1) == (("date", r6(math.log10(4.0 / 2.0)))))
    // k larger than a doc's vocabulary emits only what exists
    assert(out(2L).size == 2)
  }

  test("deterministic across partitionings; ties break by term ascending") {
    val tied = Seq((1L, "zz aa")).toDF("doc_id", "text") // equal tf and df
    val a = TfIdf.topTerms(tied.repartition(1), "doc_id", "text", 2)
      .as[(Long, Int, String, Double)].collect().sortBy(_._2).map(_._3).toSeq
    val b = TfIdf.topTerms(tied.repartition(5), "doc_id", "text", 2)
      .as[(Long, Int, String, Double)].collect().sortBy(_._2).map(_._3).toSeq
    assert(a == Seq("aa", "zz") && b == a)
  }

  test("plan: bounded in-group fold — no Window, no CartesianProduct") {
    val df = TfIdf.topTerms(corpus, "doc_id", "text", 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
