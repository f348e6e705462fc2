package graft.textops

import graft.SparkTestBase
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for the two round-9 curation additions: the
  * deterministic training-shard shuffle and corpus-frequency boilerplate
  * removal.
  */
class ShardShuffleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def lcg(id: Long): Long =
    ((id % (1L << 31)) * 1103515245L + 12345L) % (1L << 31)

  test("shardShuffle matches the hand-computed LCG assignment") {
    val df = (0L to 5L).toDF("doc_id")
    val got = TrainingData.shardShuffle(df, "doc_id", 4)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Int)].collect().toSet
    // key(id) = (id*1103515245 + 12345) mod 2^31; shard = the key's HIGH
    // bits (key*4 // 2^31) — never `key mod shards`, whose low bits are a
    // pure function of the id's low bits; pos ranks (key, id) in the shard
    assert(lcg(0) == 12345L && lcg(1) == 1103527590L)
    val expected = Set(
      (0L, 0L, 1), (2L, 0L, 2), (4L, 0L, 3), // keys 12345 < 59559187 < 119106029
      (1L, 2L, 1), (3L, 2L, 2), (5L, 2L, 3)) // 1103527590 < 1163074432 < 1222621274
    assert(got == expected)
  }

  test("shardShuffle is a permutation: every row exactly once, pos contiguous") {
    val df = (0L until 200L).toDF("doc_id")
    val r = TrainingData.shardShuffle(df, "doc_id", 8).cache()
    assert(r.count() == 200)
    assert(r.select("doc_id").distinct().count() == 200)
    // pos is 1..n within each shard with no gaps
    val perShard = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    perShard.foreach { case (_, n, lo, hi) =>
      assert(lo == 1 && hi == n, s"pos must be contiguous 1..$n, got [$lo,$hi]")
    }
    // two runs produce the identical assignment (determinism is the point)
    val again = TrainingData.shardShuffle(df, "doc_id", 8)
    assert(r.except(again).isEmpty && again.except(r).isEmpty)
    r.unpersist()
  }

  test("sequential ids disperse across shards") {
    val df = (0L until 64L).toDF("doc_id")
    val shardsHit = TrainingData.shardShuffle(df, "doc_id", 8)
      .select("shard").distinct().count()
    assert(shardsHit == 8, "a sequential id range must not collapse to few shards")
  }

  test("STRUCTURED ids (multiples of the shard count) disperse too") {
    // the regression the high-bits shard exists for: with `key mod shards`,
    // ids that are all multiples of a power-of-two shard count produce keys
    // whose low bits are constant — every row lands in ONE shard
    val df = (0L until 64L).map(_ * 8L).toDF("doc_id")
    val shardsHit = TrainingData.shardShuffle(df, "doc_id", 8)
      .select("shard").distinct().count()
    assert(shardsHit == 8,
      "multiples of the shard count must not collapse into one shard")
  }
}

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("segments above the document-frequency threshold drop everywhere") {
    val df = Seq(
      (1L, "cookie banner hello world"),
      (2L, "cookie banner goodbye moon"),
      (3L, "unrelated text here")).toDF("doc_id", "text")
    val got = Dedup.removeBoilerplate(df, "doc_id", "text", window = 2, minDocFreq = 2)
      .as[(Long, String, Long)].collect().toSet
    // "cookie banner" appears in 2 distinct docs -> dropped from BOTH
    // (contrast spanDedup, which would keep doc 1's copy)
    assert(got == Set(
      (1L, "hello world", 1L),
      (2L, "goodbye moon", 1L),
      (3L, "unrelated text here", 2L)))
  }

  test("a document that is pure boilerplate drops out entirely") {
    val df = Seq(
      (1L, "cookie banner extra words"),
      (2L, "cookie banner more stuff"),
      (3L, "cookie banner")).toDF("doc_id", "text")
    val got = Dedup.removeBoilerplate(df, "doc_id", "text", window = 2, minDocFreq = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // doc 3 lost its only segment
  }

  test("repetition WITHIN one document does not cross the distinct-doc threshold") {
    val df = Seq(
      (1L, "weird seg weird seg"),
      (2L, "totally different words")).toDF("doc_id", "text")
    val got = Dedup.removeBoilerplate(df, "doc_id", "text", window = 2, minDocFreq = 2)
      .as[(Long, String, Long)].collect().toSet
    // df("weird seg") = 1 distinct doc: both copies survive
    assert(got == Set(
      (1L, "weird seg weird seg", 2L),
      (2L, "totally different words", 2L)))
  }

  test("contrast with spanDedup: keep-first vs drop-all") {
    val df = Seq(
      (1L, "cookie banner alpha beta"),
      (2L, "cookie banner gamma delta")).toDF("doc_id", "text")
    val spanKept = Dedup.spanDedup(df, "doc_id", "text", window = 2)
      .filter($"doc_id" === 1L).select("text").as[String].head()
    assert(spanKept.contains("cookie banner"), "spanDedup keeps the first copy")
    val boilerKept = Dedup.removeBoilerplate(df, "doc_id", "text", window = 2, minDocFreq = 2)
      .filter($"doc_id" === 1L).select("text").as[String].head()
    assert(!boilerKept.contains("cookie banner"), "removeBoilerplate drops all copies")
  }
}
