package graft.textops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")

  test("redactPii replaces all four PII kinds, credit card before phone") {
    val df = Seq(
      "mail a.b+c@ex-ample.co.uk now",
      "card 1234-5678-9012-3456 ok",
      "call 415 555 0042 or 415.555.0042",
      "host 10.0.0.1 up",
      "clean text").toDF("t")
    val out = df.select(TrainingData.redactPii($"t")).as[String].collect().toSeq
    assert(out == Seq(
      "mail <EMAIL> now",
      "card <CREDIT_CARD> ok",
      "call <PHONE> or <PHONE>",
      "host <IP> up",
      "clean text"))
    // the 4-4-4-4 run must become ONE credit card, not phone fragments
    val mixed = Seq("x 4242 4242 4242 4242 y").toDF("t")
    assert(mixed.select(TrainingData.redactPii($"t")).as[String].head() ==
      "x <CREDIT_CARD> y")
  }

  test("hasPii and piiHits agree with redaction") {
    val df = Seq("a@b.io and c@d.io", "nothing here").toDF("t")
    assert(df.select(TrainingData.hasPii($"t")).as[Boolean].collect().toSeq ==
      Seq(true, false))
    assert(df.select(TrainingData.piiHits($"t", TrainingData.EmailRe))
      .as[Int].collect().toSeq == Seq(2, 0))
  }

  test("deterministicBucket survives huge ids under ANSI mode (no int64 overflow)") {
    // ids above ~8.36e9 overflow the naive id*1103515245 multiply; the
    // reduced form must stay exact — reference value computed in plain Scala
    val big = 9000000000L
    // high-bits bucket: floor(lcg * 2048 / 2^31) = lcg >> 20
    val expected = java.lang.Math.floorMod(
      java.lang.Math.floorMod(big, 1L << 31) * 1103515245L + 12345L,
      1L << 31) >> 20
    val got = Seq(big).toDF("id")
      .select(TrainingData.deterministicBucket($"id", 2048)).as[Long].head()
    assert(got == expected)
    // and Long.MaxValue must not throw either
    Seq(Long.MaxValue).toDF("id")
      .select(TrainingData.deterministicBucket($"id", 2048)).as[Long].head()
  }

  test("stratifiedSample is a map-only filter (no shuffle) and deterministic") {
    val sampled = TrainingData.stratifiedSample(
      docs.select($"doc_id", $"source"), "doc_id", "source",
      Map("src0" -> 1024), defaultPer2048 = 512)
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"))
    val a = sampled.collect().map(_.getLong(0)).sorted.toSeq
    val b = sampled.collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // keep fraction lands near the requested per-2048 cutoffs
    val total = docs.count().toDouble
    assert(a.size < total) // strictly sampled
  }

  test("exactKPerStratum equals the naive single-window ranking, no helper columns") {
    val in = docs.select($"doc_id", $"source")
    val k = 7
    val fast = TrainingData.exactKPerStratum(in, "doc_id", "source", k, salts = 8)
    assert(fast.columns.toSeq == Seq("doc_id", "source"))
    val naiveW = Window.partitionBy($"source")
      .orderBy(TrainingData.deterministicBucket($"doc_id", 2048), $"doc_id")
    val naive = in.withColumn("rn", row_number().over(naiveW))
      .filter($"rn" <= k).drop("rn")
    assert(fast.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      naive.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    // exactly k per stratum (every sf0.001 source has > k docs)
    val sizes = fast.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == k))
  }

  test("packBins: contiguous greedy fill, bin boundaries respect the budget") {
    val df = Seq(
      ("s", 1L, 30L), ("s", 2L, 30L), ("s", 3L, 30L), ("s", 4L, 30L),
      ("t", 5L, 250L), ("t", 6L, 10L)).toDF("shard", "id", "cost")
    val out = TrainingData.packBins(df, "cost", "id", Seq("shard"), budget = 100L)
      .select($"id", $"bin").as[(Long, Long)].collect().toMap
    // s: prefix-exclusive 0,30,60,90 -> bins 0,0,0,0 ... wait 90/100=0
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 0 && out(4L) == 0)
    // t: 0 -> bin 0; 250 -> bin 2
    assert(out(5L) == 0 && out(6L) == 2)
    // bins are monotone in fill order within a shard on real data
    val real = TrainingData.packBins(
      docs.select($"doc_id", $"source", $"n_chars"),
      "n_chars", "doc_id", Seq("source"), budget = 4096L)
      .select($"source", $"doc_id", $"bin")
      .orderBy($"source", $"doc_id").collect()
    real.groupBy(_.getString(0)).values.foreach { rows =>
      val bins = rows.map(_.getLong(2))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
  }

  test("strictWordGrams: none below k words, n-k+1 above") {
    val df = Seq("a b c", "a b c d e f g h i").toDF("t")
    val grams = df.select(TrainingData.strictWordGrams($"t", 8)).as[Seq[String]]
      .collect().toSeq
    assert(grams(0).isEmpty)
    assert(grams(1) == Seq("a b c d e f g h", "b c d e f g h i"))
  }

  test("native strictWordGrams ≡ HOF formulation, incl. whitespace edge cases") {
    // the HOF version is what the DuckDB oracle mirrors; the native expression
    // must agree everywhere — including space-only trim (tabs survive) and
    // trailing-empty-token splits where Java's default String ops diverge
    val tricky = Seq(
      "A b C d E f G h i",
      "  leading spaces a b c d e f g h",
      "trailing spaces a b c d e f g h   ",
      "\ttab lead a b c d e f g h",
      "tab trail a b c d e f g h\t",
      "inner\t\ttabs a b c d e f g h",
      "", "   ", "short text")
    val df = tricky.toDF("t")
    val native = df.select(TrainingData.strictWordGrams($"t", 8)).as[Seq[String]].collect().toSeq
    val hof = df.select(TrainingData.strictWordGramsHof($"t", 8)).as[Seq[String]].collect().toSeq
    assert(native == hof)
    // and over the real corpus
    val d = docs.select($"text")
    val n2 = d.select(TrainingData.strictWordGrams($"text", 8)).as[Seq[String]].collect().toSeq
    val h2 = d.select(TrainingData.strictWordGramsHof($"text", 8)).as[Seq[String]].collect().toSeq
    assert(n2 == h2)
  }

  test("decontaminate flags planted eval-set copies via a broadcast join") {
    val train = docs.select($"doc_id", $"text")
    val bench = train.filter($"doc_id" < 20)
      .select(($"doc_id" + 500000).as("doc_id"), $"text")
    val out = TrainingData.decontaminate(train, bench, "doc_id", "text", k = 8)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val flagged = out.select($"doc_id").as[Long].collect().toSet
    // every train doc whose text has >= 8 words and doc_id < 20 shares all its
    // grams with the bench copy, so it must be flagged
    val mustFlag = train.filter($"doc_id" < 20)
      .filter(size(split(lower(trim($"text")), "\\s+")) >= 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(mustFlag.nonEmpty && mustFlag.subsetOf(flagged))
  }

  test("chunkWindows: overlap, coverage, short-final-window, edge sizes") {
    val d = Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (1L, "a b c d"), // exactly window -> 1 chunk
      (2L, "a b c d e"), // window+1 -> 2 chunks, second short
      (3L, "  "), // empty after trim -> no chunks
      (4L, "x")).toDF("doc_id", "text")
    val got = TrainingData.chunkWindows(d, "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (0L, 0, "t1 t2 t3 t4", 4),
      (0L, 1, "t4 t5 t6 t7", 4), // stride 3 < window 4: one-token overlap
      (0L, 2, "t7 t8 t9 t10", 4),
      (1L, 0, "a b c d", 4),
      (2L, 0, "a b c d", 4),
      (2L, 1, "d e", 2), // final window short, never empty
      (4L, 0, "x", 1)))
    // every token of doc 0 appears in some chunk (coverage)
    val covered = got.filter(_._1 == 0L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    intercept[IllegalArgumentException](
      TrainingData.chunkWindows(d, "text", window = 4, stride = 5))
    intercept[IllegalArgumentException](
      TrainingData.chunkWindows(d, "text", window = 0, stride = 1))
  }
}
