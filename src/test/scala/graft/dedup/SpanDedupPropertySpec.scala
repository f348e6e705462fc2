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

  // The retired `id*100000+idx` ordering key collided exactly here: doc 0's
  // span index 100000 and doc 1's span index 0 encoded to the same ordinal, so
  // a shared span at those positions was kept TWICE. Struct ordering has no
  // collision bound — a >100k-span document (a ~1M-word book at window 10)
  // must dedup exactly like a short one.
  test("document with >100k spans: no ordering-key collision with a later doc") {
    val bigWords = (0 to 120000).map(i => if (i == 100000) "dup" else s"a$i")
    val df = Seq(
      (0L, bigWords.mkString(" ")), // span idx 100000 is "dup"
      (1L, "dup") // same span at idx 0 of a later doc: must lose to (0, 100000)
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", window = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L)) // doc 1 vanishes entirely
    assert(out.head.getLong(2) == 120001L) // every span of doc 0 kept once
  }

  // ids past ~9.2e13 overflowed the arithmetic key's int64 multiply (an ANSI
  // runtime error); struct ordering is overflow-free by construction
  test("ids beyond the old encoding's overflow bound keep-first correctly") {
    val base = 100000000000000L // 1e14: old key would overflow Long
    val df = Seq(
      (base + 1, "shared bb"),
      (base, "shared aa")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", window = 1)
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(base -> "shared aa", (base + 1) -> "bb"))
  }

  // the curation YAML's id-column is arbitrary — string/UUID ids must work
  // (the arithmetic key silently nulled them), first = lexicographic min id
  test("string ids: keep-first by lexicographic (id, idx) ordering") {
    val df = Seq(
      ("uuid-b", "shared bb"),
      ("uuid-a", "shared aa")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", window = 1)
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getString(0) -> r.getString(1)).toSeq ==
      Seq("uuid-a" -> "shared aa", "uuid-b" -> "bb"))
  }
}
