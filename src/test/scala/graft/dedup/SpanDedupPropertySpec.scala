package graft.dedup

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-level guarantees of span dedup:
  *  - a corpus with NO cross-document (or in-document) span repetition passes
  *    through losslessly, text canonicalized (lowercase, single spaces) and
  *    span counts exact;
  *  - planting an exact copy of any document removes the copy entirely and
  *    never disturbs the other documents.
  */
class SpanDedupPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def check(prop: Prop, tests: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  // documents whose words are globally unique (docId-wordIdx tokens): no span
  // can repeat anywhere
  private val uniqueCorpus: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(1, 6)
    lens <- Gen.listOfN(nDocs, Gen.chooseNum(1, 37))
  } yield lens.zipWithIndex.map { case (len, d) =>
    (d.toLong, (0 until len).map(w => s"W$d-$w").mkString("  "))
  }

  test("no-repetition corpus: lossless canonical pass-through, exact span counts") {
    check(Prop.forAll(uniqueCorpus) { docs =>
      val out = Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", window = 5)
        .orderBy("doc_id").collect()
      out.length == docs.length && docs.forall { case (id, text) =>
        val row = out.find(_.getLong(0) == id).get
        val canonical = text.toLowerCase.split("\\s+").mkString(" ")
        val nWords = text.split("\\s+").length
        row.getString(1) == canonical &&
          row.getLong(2) == math.ceil(nWords / 5.0).toLong
      }
    })
  }

  test("planted exact copy vanishes; all other documents are untouched") {
    check(Prop.forAll(uniqueCorpus, Gen.chooseNum(0, 100)) { (docs, pick) =>
      val victim = docs(pick % docs.length)
      val planted = docs :+ ((victim._1 + 1000L, victim._2))
      val out = Dedup.spanDedup(planted.toDF("doc_id", "text"), "doc_id", "text", window = 5)
        .select($"doc_id").as[Long].collect().toSet
      out == docs.map(_._1).toSet
    })
  }
}
