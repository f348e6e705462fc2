package graft.textops

import graft.SparkTestBase
import graft.core.TableSchema
import graft.sinks.LakehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Inverted-index maintenance: postings tokenization, exactly-once under
  * kill/restart with a commit landing while down, conjunctive lookups, and
  * the probe-side file pruning that makes a term lookup O(posting list).
  */
class InvertedIndexSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "Spark joins shuffle data; broadcast joins avoid it"),
    (1L, "merge engines fold batches"),
    (2L, "zone maps prune files, blooms prune the rest"),
    (3L, "JOINS and merge, again: joins!"),
    (4L, ""))

  test("postings: lowercase [a-z0-9]+ runs, distinct per document") {
    val p = InvertedIndex.postings(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(p.contains(("joins", 0L)) && p.contains(("joins", 3L)))
    assert(p.count(_ == ("joins", 3L)) == 1) // three occurrences, one posting
    assert(p.contains(("merge", 1L)) && p.contains(("merge", 3L)))
    assert(!p.exists(_._2 == 4L)) // empty doc: no postings
    assert(p.forall { case (t, _) => t.matches("[a-z0-9]+") })
  }

  test("kill/restart with a commit while down: index equals one-shot postings; probes prune") {
    val d = corpus.toDF("doc_id", "text")
    val srcRoot = Files.createTempDirectory("inv_src").toString
    val idxRoot = Files.createTempDirectory("inv_idx").toString
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)

    src.append(d.filter($"doc_id" <= 1))
    val q1 = InvertedIndex.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try {
      q1.processAllAvailable()
      src.append(d.filter($"doc_id" === 2 || $"doc_id" === 3))
      q1.processAllAvailable()
    } finally q1.stop()
    src.append(d.filter($"doc_id" === 4)) // lands while DOWN
    val q2 = InvertedIndex.maintain(spark, srcRoot, idxRoot, "doc_id", "text")
    try q2.processAllAvailable() finally q2.stop()

    val index = new LakehouseTable(spark, idxRoot)
    val got = index.read().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = InvertedIndex.postings(d, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(index.read().count() == want.size) // nothing doubled

    // single-term lookup
    assert(InvertedIndex.lookup(index, "joins").as[Long].collect().toSet == Set(0L, 3L))
    assert(InvertedIndex.lookup(index, "zzz").isEmpty)
    // fuzzy: 'joinz' misses exactly but is 1 edit from 'joins' (and 2 from
    // 'join' — excluded at maxDist 1); maxDist 0 degenerates to exact
    assert(InvertedIndex.lookup(index, "joinz").isEmpty)
    assert(InvertedIndex.lookupFuzzy(index, "joinz", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("joins", 0L), ("joins", 3L)))
    assert(InvertedIndex.lookupFuzzy(index, "merge", maxDist = 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("merge", 1L), ("merge", 3L)))
    assert(InvertedIndex.lookupFuzzy(index, "qqqqq", maxDist = 1).isEmpty)
    // conjunctive: docs containing BOTH joins and merge
    assert(InvertedIndex.lookupAll(index, Seq("joins", "merge")).as[Long]
      .collect().toSet == Set(3L))
    assert(InvertedIndex.lookupAll(index, Seq("joins", "joins")).as[Long]
      .collect().toSet == Set(0L, 3L)) // duplicate probe terms collapse

    // dictionary: maintained in the same txn discipline; vocabulary equals
    // the postings' distinct terms, total df equals each term's doc count
    val dict = InvertedIndex.dictionaryTable(spark, idxRoot)
    assert(dict.snapshot().meta.nonEmpty, "maintain must create the dictionary")
    val dictDf = dict.read().groupBy($"term").agg(sum($"df").as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dictDf.keySet == want.map(_._1))
    assert(dictDf("joins") == 2L && dictDf("merge") == 2L && dictDf("zone") == 1L)

    // the fuzzy path reads its vocabulary from the DICTIONARY, never from a
    // postings scan: plant a posting whose term is absent from the
    // dictionary — 1 edit from the query — and assert fuzzy does NOT see it
    index.append(Seq(("joinx", 999L)).toDF("term", "doc_id"))
    assert(InvertedIndex.lookupFuzzy(index, "joinz", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("joins", 0L), ("joins", 3L)),
      "fuzzy vocabulary must come from the dictionary table, not the postings")
    // the candidate cap fails loudly instead of collecting unbounded
    val e = intercept[IllegalArgumentException](
      InvertedIndex.lookupFuzzy(index, "joins", maxDist = 5, maxCandidates = 2)
        .collect())
    assert(e.getMessage.contains("maxCandidates"))

    // pruning: with range-partitioned postings, a probe of a term in the
    // FIRST lexicographic band must not admit every file
    val snap = index.snapshot()
    assert(snap.files.forall(_.stats.contains("term")))
    if (snap.files.size > 1) {
      val admitted = snap.files.count(f =>
        f.stats("term").min <= "avoid" && "avoid" <= f.stats("term").max)
      assert(admitted < snap.files.size,
        s"zone maps admitted all ${snap.files.size} files for one term")
    }
  }

  test("positional index: phrase queries match consecutive tokens only") {
    val docs = Seq(
      (0L, "merge engines fold batches"), // "merge engines" adjacent
      (1L, "engines merge quickly"), // reversed: no match
      (2L, "merge the engines"), // gap: no match
      (3L, "a merge engines merge engines b"), // two occurrences
      (4L, "big data, wins big")) // punctuation between tokens is a boundary
    val d = docs.toDF("doc_id", "text")
    val srcRoot = Files.createTempDirectory("phr_src").toString
    val idxRoot = Files.createTempDirectory("phr_idx").toString
    val src = new LakehouseTable(spark, srcRoot)
    src.create(TableSchema(d.schema), buckets = 2)
    src.append(d.filter($"doc_id" <= 2))
    val q1 = InvertedIndex.maintainPositional(spark, srcRoot, idxRoot, "doc_id", "text")
    try q1.processAllAvailable() finally q1.stop()
    src.append(d.filter($"doc_id" > 2)) // while DOWN
    val q2 = InvertedIndex.maintainPositional(spark, srcRoot, idxRoot, "doc_id", "text")
    try q2.processAllAvailable() finally q2.stop()
    val index = new LakehouseTable(spark, idxRoot)

    def ph(ts: String*): Set[Long] =
      InvertedIndex.phrase(index, ts).as[Long].collect().toSet
    assert(ph("merge", "engines") == Set(0L, 3L))
    assert(ph("engines", "merge") == Set(1L, 3L)) // order matters
    assert(ph("merge", "the", "engines") == Set(2L)) // 3-term chain
    assert(ph("merge", "engines", "merge", "engines") == Set(3L))
    assert(ph("big", "wins").isEmpty) // big@0/3, wins@2: never adjacent
    assert(ph("data", "wins") == Set(4L)) // "data, wins": comma is not a token, so adjacent
    assert(ph("merge") == Set(0L, 1L, 2L, 3L)) // 1-term phrase = membership
    // positions are per-occurrence and sorted
    val p3 = index.read().filter($"term" === "merge" && $"doc_id" === 3L)
      .head().getSeq[Int](2)
    assert(p3 == Seq(1, 3))
  }
}
