package graft.dedup

import graft.SparkTestBase
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("tokenCount handles empties and runs of whitespace") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
    assert(df.select(TextFunctions.tokenCount($"t")).as[Int].collect().toSeq ==
      Seq(3, 0, 0, 1))
  }

  test("fingerprint is whitespace/case canonical") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint($"x") === TextFunctions.fingerprint($"y")).as[Boolean]
    assert(r.head())
  }

  test("langId picks profile with most stopword hits, zh via CJK") {
    val df = Seq(
      "the cat and the dog is here with that thing",
      "der Hund und die Katze ist mit nicht da",
      "le chat est avec les chiens dans la maison",
      "el perro y la casa es con los gatos para que",
      "深度学习模型").toDF("t")
    assert(df.select(TextFunctions.langId($"t")).as[String].collect().toSeq ==
      Seq("en", "de", "fr", "es", "zh"))
  }

  test("repetitionStats counts tokens, distinct words, top bigram, 5-grams") {
    import graft.functions.CatalystExprs
    val df = Seq("a b a b a", "  ", "x y z w v u", "one").toDF("t")
    val rows = df.select(CatalystExprs.repetitionStats($"t").as("s"))
      .select($"s.tokens", $"s.uniq_words", $"s.top_bigram", $"s.uniq_bigrams",
        $"s.uniq_5grams")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    // "a b a b a": 5 tokens, 2 distinct; bigrams a-b ×2, b-a ×2 → top 2, uniq 2;
    // one 5-gram window
    assert(rows(0) == ((5, 2, 2, 2, 1)))
    assert(rows(1) == ((0, 0, 0, 0, 0))) // whitespace-only → all zeros
    assert(rows(2) == ((6, 6, 1, 5, 2))) // all distinct: top bigram count 1
    assert(rows(3) == ((1, 1, 0, 0, 0))) // single token: no bigrams
  }

  test("shingles produce n-k+1 word k-grams") {
    val df = Seq("a b c d").toDF("t")
    assert(df.select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head() ==
      Seq("a b c", "b c d"))
    // shorter than k: whole text as one shingle
    val short = Seq("a b").toDF("t")
    assert(short.select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head() == Seq("a b"))
  }

  test("quality score deterministic and in [0,1]") {
    val docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
    val scores = docs.select(TextFunctions.qualityScore($"text").as("q"))
    val agg = scores.agg(min($"q"), max($"q")).head()
    assert(agg.getDouble(0) >= 0.0 && agg.getDouble(1) <= 1.0)
  }
}

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dot/cosine basic identities") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(3f, 4f, 1f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot($"a", $"b")).as[Double].head() == 5.0)
    val cosSelf = df.select(VectorFunctions.cosine($"a", $"a")).as[Double].head()
    assert(math.abs(cosSelf - 1.0) < 1e-12)
  }

  test("hyperplane signature: identical vectors share signature, scaled too") {
    val df = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(2f, 4f, 6f, 8f)), // same direction
      (3L, Seq(-1f, -2f, -3f, -4f)) // opposite
    ).toDF("id", "v")
    val sigs = df.select($"id",
      VectorFunctions.hyperplaneSignature($"v", 4, 16, 42L).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docsWithDups = {
    val docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text")
    // duplicate first 50 docs with new ids and cosmetic whitespace/case changes
    val dups = docs.filter($"doc_id" < 50)
      .select(($"doc_id" + 10000).as("doc_id"), upper($"text").as("text"))
    docs.union(dups)
  }

  test("exactByFingerprint collapses cosmetic duplicates to min doc_id") {
    val out = Dedup.exactByFingerprint(docsWithDups, "doc_id", "text")
    val total = docsWithDups.count()
    assert(out.count() == total - 50)
    // survivors are the original ids
    assert(out.filter($"doc_id" >= 10000).count() == 0)
    assert(out.filter($"dup_count" === 2).count() == 50)
  }

  test("duplicateClusters labels components with their min id") {
    // chain 1-2-3 (transitive: 1 and 3 share no edge), isolated pair 10-11,
    // and a triangle 20-21-22 — plus node order scrambled in the pair list
    val pairs = Seq((2L, 3L), (10L, 11L), (21L, 22L), (1L, 2L), (20L, 21L), (20L, 22L))
      .toDF("idA", "idB")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters converges on a long path (diameter > 1 round)") {
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("idA", "idB")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(_ == 0L))
  }

  test("minhash near-dups find exact-copy pairs with jaccard 1.0") {
    val docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text").filter($"doc_id" < 100)
    val dups = docs.filter($"doc_id" < 20)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val all = docs.union(dups)
    val pairs = Dedup.minHashNearDuplicates(all, "doc_id", "text", 0.8)
    val found = pairs.select($"idA", $"idB").as[(Long, Long)].collect().toSet
    // every planted pair must be found (identical docs always share all bands)
    (0L until 20L).foreach(i => assert(found.contains((i, i + 1000)), s"missing pair $i"))
    assert(pairs.filter($"jaccard" === 1.0).count() >= 20)
  }

  test("minhash plan has no CartesianProduct") {
    val docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text")
    val plan = Dedup.minHashNearDuplicates(docs, "doc_id", "text", 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("simhash: identical docs have hamming 0 and are found") {
    val docs = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text").filter($"doc_id" < 50)
    val dups = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 500).as("doc_id"), $"text")
    val pairs = Dedup.simHashNearDuplicates(docs.union(dups), "doc_id", "text", maxHamming = 3)
    val found = pairs.filter($"hamming" === 0)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    (0L until 10L).foreach(i => assert(found.contains((i, i + 500))))
  }

  test("embedding near-dups via hyperplane LSH") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    val dups = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 5000).as("vec_id"), $"embedding")
    val pairs = Dedup.embeddingNearDuplicates(
      emb.union(dups), "vec_id", "embedding", dim = 64, threshold = 0.99)
    val found = pairs.select($"idA", $"idB").as[(Long, Long)].collect().toSet
    (0L until 10L).foreach(i => assert(found.contains((i, i + 5000))))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("semanticDeduplicate: drops in-cluster near-dups, never compares across clusters") {
    // centroids = two lowest ids (the axis vectors). 2 and 5 are in-cluster
    // near-dups of 0 and 1 → dropped; 3 and 4 have cosine ≈ 1 with each other
    // but straddle the cluster boundary → both kept (the SemDeDup semantic:
    // candidate pairs exist only within a cluster)
    val df = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(1f, 0.001f, 0f, 0f)),
      (3L, Seq(1.0001f, 1f, 0f, 0f)),
      (4L, Seq(1f, 1.0001f, 0f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDeduplicate(df, "vec_id", "embedding",
      dim = 4, k = 2, threshold = 0.999)
    val kept = out.filter($"kept").select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 3L, 4L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("spanDedup: copies vanish, originals reassemble canonically, cross-doc spans keep first") {
    val df = Seq(
      (0L, "Alpha beta  Gamma delta"), // canonical form of doc 1
      (1L, "alpha beta gamma delta"), // exact span copy -> vanishes
      (2L, "fresh words gamma delta"), // span "gamma delta" first occurred in doc 0
      (3L, "fresh words something else") // shares span 0 with doc 2 -> loses it
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", window = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 3L))
    assert(out(0).getString(1) == "alpha beta gamma delta" && out(0).getLong(2) == 2)
    assert(out(1).getString(1) == "fresh words" && out(1).getLong(2) == 1)
    assert(out(2).getString(1) == "something else" && out(2).getLong(2) == 1)
  }

  test("incrementalDedup equals the exact anti-join, even with forced false positives") {
    val hist = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text")
    val newBatch = hist.filter($"doc_id" < 40)
      .select(($"doc_id" + 400000).as("doc_id"), $"text")
      .unionByName(hist.filter($"doc_id" < 20)
        .select(($"doc_id" + 410000).as("doc_id"),
          concat(lit("fresh "), $"text").as("text")))
    // fpp = 0.5: roughly half the genuinely-new docs become Bloom false
    // positives and MUST be rescued by the exact verify stage
    val got = Dedup.incrementalDedup(newBatch, hist, "doc_id", "text", fpp = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    val expected = newBatch.join(
      hist.select(TextFunctions.fingerprint($"text").as("fp")).distinct(),
      TextFunctions.fingerprint(newBatch("text")) === $"fp", "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got == (0L until 20L).map(_ + 410000).toSet) // only the fresh docs survive
  }

  test("incrementalDedup scans history exactly once per run") {
    // an accumulator riding the history's text column counts actual row
    // evaluations: sizing the Bloom, building it, and the exact-verify
    // semi-join must all read the one cached fingerprint pass — at 100 TB
    // the history scan IS the dominant cost, and round 6 paid it twice
    val acc = spark.sparkContext.longAccumulator("graft-hist-scans")
    val tick = udf((s: String) => { acc.add(1L); s })
    val hist0 = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text")
    val n = hist0.count()
    val hist = hist0.withColumn("text", tick($"text"))
    val newBatch = hist0.filter($"doc_id" < 40)
      .select(($"doc_id" + 400000).as("doc_id"), $"text")
    Dedup.incrementalDedup(newBatch, hist, "doc_id", "text").collect()
    assert(acc.value == n,
      s"history rows evaluated ${acc.value} times total, expected exactly $n (one scan)")
  }

  test("incrementalDedup plan: history is probed by broadcast, never shuffle-joined") {
    val hist = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "documents")
      .select($"doc_id", $"text")
    val newBatch = hist.filter($"doc_id" < 10)
      .select(($"doc_id" + 400000).as("doc_id"), $"text")
    val out = Dedup.incrementalDedup(newBatch, hist, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }
}

class AnnSpec extends AnyFunSuite {
  import graft.similarity.Ann
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(spark, SparkTestBase.sf0001, "embeddings")
    .select($"vec_id", $"embedding").cache()

  test("brute-force top-k: self is rank 1 with cosine 1") {
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val res = Ann.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 5)
    val top1 = res.filter($"rank" === 1).select($"qid", $"cid").as[(Long, Long)]
      .collect().toMap
    (0L until 5L).foreach(q => assert(top1(q) == q))
    assert(res.groupBy($"qid").count().select(min($"count")).as[Long].head() == 5)
  }

  test("pq: every indexed query retrieves itself at rank 1 by ADC") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val idx = Ann.PqIndex.build(emb, "vec_id", "embedding", m = 8, ks = 16,
      sampleSize = 200)
    val qs = emb.filter($"vec_id" < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val top1 = idx.topK(qs, k = 1).select($"qid", $"cid").as[(Long, Long)]
      .collect().toMap
    qs.foreach { case (q, _) => assert(top1(q) == q, s"query $q") }
  }

  test("pq recall@10 vs brute force is useful, and codes compress 32x") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val idx = Ann.PqIndex.build(emb, "vec_id", "embedding", m = 8, ks = 16,
      sampleSize = 200)
    // one long per vector vs 64 floats
    assert(idx.encodings.schema("codes").dataType ==
      org.apache.spark.sql.types.LongType)
    val qs = emb.filter($"vec_id" >= 50 && $"vec_id" < 60).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val pq = idx.topK(qs, k = 10).select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = emb.filter($"vec_id" >= 50 && $"vec_id" < 60)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // ADC approximates L2; embeddings are unnormalized, so compare against
    // the exact L2 top-10 (brute-force cosine would conflate metric with
    // quantization error)
    val exact = emb.select($"vec_id".as("cid"), $"embedding".as("cvec"))
      .join(broadcast(queries))
      .select($"qid", $"cid",
        aggregate(zip_with($"cvec", $"qvec",
          (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0.0d), (acc, v) => acc + v).as("l2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"l2".asc, $"cid".asc)))
      .filter($"rank" <= 10)
      .select($"qid", $"cid").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = qs.map { case (q, _) => (pq(q) & exact(q)).size / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 $mean too low: $recalls")
  }

  test("bandSplit: 64-bit band masks all bits; non-dividing bands refuse") {
    // `1L << 64` wraps to 1 on the JVM: a naive (1L << 64) - 1 mask would
    // be ZERO, sending every row to bucket 0 — the single-bucket all-pairs
    // join the module's header promises never happens. And a non-dividing
    // band count would silently drop the signature's top bits (recall
    // loss), so it refuses instead.
    assert(Dedup.bandSplit(64, 1) == ((64, -1L)))
    assert(Dedup.bandSplit(64, 4) == ((16, 0xFFFFL)))
    intercept[IllegalArgumentException](Dedup.bandSplit(16, 3))
    intercept[IllegalArgumentException](Dedup.bandSplit(16, 0))
  }

  test("lsh top-k finds the identical vector") {
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val res = Ann.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qvec",
      k = 5, dim = 64)
    val top1 = res.filter($"rank" === 1).select($"qid", $"cid").as[(Long, Long)]
      .collect().toMap
    (0L until 5L).foreach(q => assert(top1(q) == q))
  }

  test("ivf top-k finds the identical vector with nprobe=4") {
    implicit val s = spark
    val idx = Ann.IvfIndex.build(emb, "vec_id", "embedding", numCentroids = 8,
      sampleSize = 500)
    val queries = emb.filter($"vec_id" < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val res = idx.topK(queries, k = 3, nprobe = 4)
    val top1 = res.filter($"rank" === 1).select($"qid", $"cid").as[(Long, Long)]
      .collect().toMap
    (0L until 5L).foreach(q => assert(top1(q) == q))
  }
}

class MultimodalSpec extends AnyFunSuite {
  import graft.multimodal.Multimodal
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("feature extraction plumbing: schema, determinism, batching") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "kind", "features"))
    assert(feats.count() == 30)
    val f0a = feats.filter($"media_id" === 0).select($"features").as[Seq[Float]].head()
    val f0b = Multimodal.extractFeatures(media).filter($"media_id" === 0)
      .select($"features").as[Seq[Float]].head()
    assert(f0a == f0b) // deterministic stub
    assert(f0a.length == Multimodal.featureDim)
  }

  test("frame sampling expands video rows only") {
    val media = Multimodal.syntheticMedia(spark, 9) // 3 videos (10s each)
    val frames = Multimodal.sampleFrames(media, everyMs = 2500)
    // 10000ms / 2500ms -> 5 samples (0,2500,5000,7500,10000) per video
    assert(frames.count() == 3 * 5)
    assert(frames.select($"media_id").distinct().count() == 3)
  }
}
