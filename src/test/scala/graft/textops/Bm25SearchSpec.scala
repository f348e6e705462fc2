package graft.textops

import graft.SparkTestBase
import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** BM25 maintenance + ranking: exactly-once posting/doclen tables under
  * kill/restart, and a hand-computed ranking on a corpus small enough to
  * verify the formula by hand-shaped expectations (relative order + the
  * saturation and length-normalization behaviors that define BM25).
  */
class Bm25SearchSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark spark spark spark"), // tf saturates: many repeats, short doc
    (1L, "spark joins data"), // one mention, short doc
    (2L, "spark " + ("filler " * 40).trim), // one mention, LONG doc
    (3L, "joins and shuffles"),
    (4L, "nothing relevant here"))

  test("maintenance across kill/restart: postings and doclen equal a one-shot build") {
    val d = corpus.toDF("doc_id", "text")
    val srcRoot = Files.createTempDirectory("bm25_src").toString
    val idxRoot = Files.createTempDirectory("bm25_idx").toString
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)
    src.append(d.filter($"doc_id" <= 1))
    val q1 = Bm25Search.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try {
      q1.processAllAvailable()
      src.append(d.filter($"doc_id" === 2 || $"doc_id" === 3))
      q1.processAllAvailable()
    } finally q1.stop()
    src.append(d.filter($"doc_id" === 4)) // while DOWN
    val q2 = Bm25Search.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q2.processAllAvailable() finally q2.stop()

    val postings = new LakehouseTable(spark,
      java.nio.file.Paths.get(idxRoot, "postings").toString).read()
    val doclen = new LakehouseTable(spark,
      java.nio.file.Paths.get(idxRoot, "doclen").toString).read()
    assert(doclen.count() == 5)
    assert(doclen.filter($"doc_id" === 0).head().getLong(1) == 4L)
    assert(doclen.filter($"doc_id" === 2).head().getLong(1) == 41L)
    val sparkTf = postings.filter($"term" === "spark")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(sparkTf == Map(0L -> 4L, 1L -> 1L, 2L -> 1L))
    assert(postings.groupBy($"term", $"doc_id").count()
      .filter($"count" > 1).isEmpty) // nothing indexed twice

    // ranking behaviors that define BM25:
    val r = Bm25Search.search(spark, idxRoot, Seq("spark"), k = 5)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getInt(2)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // tf saturation: 4 mentions beat 1, but by less than 4x
    val byDoc = r.map(x => x._1 -> x._2).toMap
    assert(byDoc(0L) > byDoc(1L) && byDoc(0L) < 4 * byDoc(1L))
    // length normalization: same tf, the 41-token doc scores below the 3-token one
    assert(byDoc(1L) > byDoc(2L))
    // multi-term: doc 1 (spark AND joins AND data) outranks everything
    val m = Bm25Search.search(spark, idxRoot, Seq("spark", "joins", "data"), k = 5)
      .collect().map(x => (x.getLong(0), x.getInt(2)))
    assert(m.head == ((1L, 1)))
    // absent terms contribute nothing; all-absent query returns empty
    assert(Bm25Search.search(spark, idxRoot, Seq("zzz"), k = 5).isEmpty)
    // query terms normalize through the INDEX analyzer: the postings only
    // store lowercase [a-z0-9] tokens, so a raw "Spark!" must match them
    // instead of silently returning nothing
    val up = Bm25Search.search(spark, idxRoot, Seq("Spark!"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(up == Seq(0L, 1L, 2L), s"analyzer-normalized query must hit: $up")
  }
}
