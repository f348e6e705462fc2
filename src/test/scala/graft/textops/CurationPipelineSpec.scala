package graft.textops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("yaml parse: sections, defaults, step configs, unknown step rejected") {
    val cdef = CurationPipeline.parse(
      """curation:
        |  input: /in
        |  output: /out
        |  steps:
        |    - type: quality-filter
        |      min-score: 0.5
        |    - type: pii-redact
        |""".stripMargin)
    assert(cdef.idCol == "doc_id" && cdef.textCol == "text")
    assert(cdef.steps.map(_.stepType) == Seq("quality-filter", "pii-redact"))
    assert(cdef.steps.head.config("min-score") == "0.5")
    assert(CurationPipeline.isCuration("curation:\n  input: /x\n"))
    assert(!CurationPipeline.isCuration("source:\n  type: values\n"))
    intercept[IllegalArgumentException] {
      CurationPipeline.applyStep(spark, Seq((1L, "t")).toDF("doc_id", "text"),
        CurationPipeline.StepDef("no-such-step", Map.empty), "doc_id", "text")
    }
  }

  test("end-to-end: dups drop, PII redacts, sample is deterministic, counts audit") {
    val in = Files.createTempDirectory("curate_in").toString
    val out = Files.createTempDirectory("curate_out").toString
    val bench = Files.createTempDirectory("curate_bench").toString
    // 40 good docs; 5 exact copies (ids 100-104 dup ids 0-4); 2 with PII
    val good = (0L until 40L).map(i =>
      (i, s"plain document number $i with several distinct words in it ok"))
    val dups = (0L until 5L).map(i =>
      (100L + i, s"plain document number $i with several distinct words in it ok"))
    val pii = Seq(
      (200L, "contact me at alice@example.com for the document text here ok"),
      (201L, "my card is 4111 1111 1111 1111 and this document text here ok"))
    (good ++ dups ++ pii).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    // benchmark shares doc 7's exact text -> decontamination must drop doc 7
    Seq((900L, good(7)._2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(bench)

    val cdef = CurationPipeline.parse(
      s"""curation:
         |  input: $in
         |  output: $out
         |  steps:
         |    - type: exact-dedup
         |    - type: decontaminate
         |      benchmark: $bench
         |      k: 8
         |    - type: pii-redact
         |""".stripMargin)
    val counts = CurationPipeline.run(spark, cdef)
    assert(counts.head == ("input", 47L))
    assert(counts(1)._2 == 42L) // 5 exact copies dropped
    assert(counts(2)._2 == 41L) // doc 7 decontaminated
    assert(counts(3)._2 == 41L) // redaction rewrites, drops nothing

    val result = spark.read.parquet(out)
    assert(result.count() == 41)
    val redacted = result.filter($"doc_id" >= 200L).select($"text").as[String].collect()
    assert(redacted.forall(t => !t.contains("alice@example.com") && !t.contains("4111")))
    assert(redacted.exists(_.contains("<EMAIL>")) && redacted.exists(_.contains("<CREDIT_CARD>")))
    assert(result.filter($"doc_id" === 7L).isEmpty)
    assert(result.filter($"doc_id" === 100L).isEmpty && result.filter($"doc_id" === 0L).count() == 1)
  }

  test("semdedup step: embedded near-dups drop, unembedded docs survive") {
    val in = Files.createTempDirectory("curate_in").toString
    val out = Files.createTempDirectory("curate_out").toString
    val embDir = Files.createTempDirectory("curate_emb").toString
    // docs 0-2 carry embeddings (0 and 1, the centroid seeds, orthogonal;
    // 2 a near-copy of 0 → dropped); 3 has no embedding row and must
    // survive untouched
    (0L to 3L).map(i => (i, s"document body number $i with plenty of words"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(1f, 0.001f, 0f, 0f)))
      .toDF("doc_id", "embedding").write.mode("overwrite").parquet(embDir)
    val cdef = CurationPipeline.parse(
      s"""curation:
         |  input: $in
         |  output: $out
         |  steps:
         |    - type: semdedup
         |      embeddings: $embDir
         |      clusters: 2
         |      threshold: 0.999
         |""".stripMargin)
    CurationPipeline.run(spark, cdef)
    val kept = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 3L))
  }

  test("incremental curation: lakehouse change feed, cursor, cross-run dedup") {
    import graft.core.TableSchema
    import graft.sinks.LakehouseTable
    import org.apache.spark.sql.types._
    val lake = Files.createTempDirectory("curate_lake").toString
    val out = Files.createTempDirectory("curate_inc_out").toString
    val table = new LakehouseTable(spark, lake)
    table.create(TableSchema(
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      primaryKeys = Seq.empty), buckets = 2)

    val yaml =
      s"""curation:
         |  input: $lake
         |  input-format: lakehouse
         |  incremental: true
         |  output: $out
         |  steps:
         |    - type: incremental-dedup
         |      history: $out
         |    - type: pii-redact
         |""".stripMargin
    val cdef = CurationPipeline.parse(yaml)
    assert(cdef.incremental && cdef.inputFormat == "lakehouse")

    // run 1: first batch lands; history empty -> dedup is a no-op
    table.append((0L until 20L).map(i => (i, s"unique doc body $i here")).toDF("doc_id", "text"))
    val c1 = CurationPipeline.run(spark, cdef)
    assert(c1.head._2 == 20L && spark.read.parquet(out).count() == 20)

    // run 2: 10 new docs + 5 re-ingested exact copies of already-curated ones
    table.append(
      ((100L until 110L).map(i => (i, s"unique doc body $i here")) ++
        (0L until 5L).map(i => (1000L + i, s"unique doc body $i here")))
        .toDF("doc_id", "text"))
    val c2 = CurationPipeline.run(spark, cdef)
    // the change feed delivered only the 15 new rows (cursor worked) ...
    assert(c2.head._2 == 15L, c2.toString)
    // ... and the 5 re-ingested texts were dropped against the curated history
    assert(c2(1)._2 == 10L, c2.toString)
    assert(spark.read.parquet(out).count() == 30)

    // run 3: nothing new -> caught up, no write action at all, output unchanged
    val c3 = CurationPipeline.run(spark, cdef)
    assert(c3.isEmpty)
    assert(spark.read.parquet(out).count() == 30)

    // parse guard: incremental requires the lakehouse change feed
    intercept[IllegalArgumentException] {
      CurationPipeline.parse(
        "curation:\n  input: /x\n  output: /y\n  incremental: true\n  steps:\n    - type: pii-redact\n")
    }
    // parse guard: parquet output + incremental without a replay-absorbing
    // incremental-dedup(history=output) step is a crash-duplication bug
    intercept[IllegalArgumentException] {
      CurationPipeline.parse(
        s"curation:\n  input: $lake\n  input-format: lakehouse\n  incremental: true\n" +
          s"  output: /y\n  steps:\n    - type: pii-redact\n")
    }
  }

  test("incremental curation with lakehouse output: cursor commits atomically") {
    import graft.core.TableSchema
    import graft.sinks.LakehouseTable
    import org.apache.spark.sql.types._
    val lake = Files.createTempDirectory("curate_lake2").toString
    val out = Files.createTempDirectory("curate_atomic_out").toString + "/table"
    val table = new LakehouseTable(spark, lake)
    table.create(TableSchema(
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      primaryKeys = Seq.empty), buckets = 2)

    // no incremental-dedup step needed: the txn-riding cursor IS the guard
    val cdef = CurationPipeline.parse(
      s"""curation:
         |  input: $lake
         |  input-format: lakehouse
         |  incremental: true
         |  output: $out
         |  output-format: lakehouse
         |  steps:
         |    - type: pii-redact
         |""".stripMargin)

    table.append((0L until 20L).map(i => (i, s"doc body $i here")).toDF("doc_id", "text"))
    val c1 = CurationPipeline.run(spark, cdef)
    val outTable = new LakehouseTable(spark, out)
    assert(c1.head._2 == 20L && outTable.read().count() == 20)
    // the cursor is a txn action in the output commit, not a sidecar file
    val cursor1 = outTable.snapshot().txns(CurationPipeline.CurationRunId)
    assert(cursor1 == table.latestVersion())

    // crash-replay injection: a run that committed output+cursor then died is
    // indistinguishable from a completed run, because they were ONE commit —
    // re-running must deliver nothing and append nothing
    assert(CurationPipeline.run(spark, cdef).isEmpty)
    assert(outTable.read().count() == 20)

    // and a redelivered append of the same increment (the other crash seam:
    // executor retry after the commit) is skipped by the txn check itself
    outTable.append(
      (0L until 20L).map(i => (i, s"doc body $i here")).toDF("doc_id", "text"),
      txn = Some((CurationPipeline.CurationRunId, cursor1)))
    assert(outTable.read().count() == 20)

    // next increment flows normally and advances the in-commit cursor
    table.append(Seq((100L, "fresh doc body here")).toDF("doc_id", "text"))
    val c2 = CurationPipeline.run(spark, cdef)
    assert(c2.head._2 == 1L && outTable.read().count() == 21)
    assert(outTable.snapshot().txns(CurationPipeline.CurationRunId) > cursor1)
  }

  test("continuous curation: a standing StreamingQuery, exactly-once across restart") {
    import graft.core.TableSchema
    import graft.sinks.LakehouseTable
    import org.apache.spark.sql.types._
    val lake = Files.createTempDirectory("curate_cont_lake").toString
    val out = Files.createTempDirectory("curate_cont_out").toString + "/table"
    val table = new LakehouseTable(spark, lake)
    table.create(TableSchema(
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      primaryKeys = Seq.empty), buckets = 2)
    // docs exist BEFORE the query starts: backfill-then-tail must deliver them
    table.append(Seq(
      (0L, "contact alice@example.com with the early document body here"),
      (1L, "plain early document body here")).toDF("doc_id", "text"))

    val cdef = CurationPipeline.parse(
      s"""curation:
         |  input: $lake
         |  input-format: lakehouse
         |  output: $out
         |  output-format: lakehouse
         |  continuous: true
         |  steps:
         |    - type: pii-redact
         |""".stripMargin)
    assert(cdef.continuous)
    // parse guard: continuous requires lakehouse on both ends
    intercept[IllegalArgumentException] {
      CurationPipeline.parse(
        s"curation:\n  input: /x\n  output: /y\n  continuous: true\n" +
          "  steps:\n    - type: pii-redact\n")
    }

    val outTable = new LakehouseTable(spark, out)
    val q1 = CurationPipeline.runContinuous(spark, cdef)
    try {
      q1.processAllAvailable()
      val texts = outTable.read().orderBy($"doc_id")
        .select($"text").as[String].collect()
      assert(texts.length == 2)
      assert(texts(0).contains("<EMAIL>") && !texts(0).contains("alice@example.com"))

      // tail phase: new commits flow through the standing query
      table.append(Seq((2L, "later document body here")).toDF("doc_id", "text"))
      q1.processAllAvailable()
      assert(outTable.read().count() == 3)
    } finally q1.stop()

    // restart: commits landed while down replay exactly once
    table.append(Seq((3L, "downtime document body here")).toDF("doc_id", "text"))
    val q2 = CurationPipeline.runContinuous(spark, cdef)
    try {
      q2.processAllAvailable()
      assert(outTable.read().count() == 4)
      assert(outTable.read().select($"doc_id").as[Long].collect().sorted.toSeq ==
        (0L to 3L))
    } finally q2.stop()
  }

  test("non-incremental lakehouse output: single-commit overwrite") {
    val in = Files.createTempDirectory("curate_in2").toString
    val out = Files.createTempDirectory("curate_lake_out").toString + "/table"
    (0L until 10L).map(i => (i, s"plain document body $i here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val cdef = CurationPipeline.parse(
      s"""curation:
         |  input: $in
         |  output: $out
         |  output-format: lakehouse
         |  steps:
         |    - type: pii-redact
         |""".stripMargin)
    CurationPipeline.run(spark, cdef)
    val outTable = new graft.sinks.LakehouseTable(spark, out)
    val v1 = outTable.latestVersion()
    CurationPipeline.run(spark, cdef) // second full run replaces, not doubles
    assert(outTable.read().count() == 10)
    // the replacement is ONE commit (removes + adds together): a concurrent
    // reader sees the old output or the new one, never an empty table, and
    // every historical version still reads back non-empty
    assert(outTable.latestVersion() == v1 + 1)
    assert(outTable.read(Some(v1)).count() == 10)
  }

  test("repetition, quality, language, span-dedup, sample steps compose") {
    val df = Seq(
      (1L, "the cat and the dog is here with that thing again today fine"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "der Hund und die Katze ist mit nicht da heute gut so")
    ).toDF("doc_id", "text")
    def step(d: org.apache.spark.sql.DataFrame, t: String, cfg: (String, String)*) =
      CurationPipeline.applyStep(spark, d, CurationPipeline.StepDef(t, cfg.toMap),
        "doc_id", "text")
    // repetition gate kills the spam doc (short docs: any bigram is ~2/13 of
    // tokens, so raise the bigram gate above that noise floor)
    val rep = step(df, "repetition-filter", "max-top-bigram-frac" -> "0.25")
    assert(rep.select($"doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // language filter keeps only English
    val en = step(rep, "language-filter", "lang" -> "en")
    assert(en.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
    // span dedup preserves non-text columns and rebuilds text canonically
    val withExtra = df.withColumn("source", lit("web"))
    val sd = step(withExtra, "span-dedup", "window" -> "4")
    assert(sd.columns.toSet == Set("doc_id", "source", "text"))
    assert(sd.count() == 3)
    // deterministic sample: same fraction -> same rows, fraction 1.0 -> all
    val s1 = step(df, "sample", "fraction" -> "0.5").select($"doc_id").as[Long].collect().toSet
    val s2 = step(df, "sample", "fraction" -> "0.5").select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(step(df, "sample", "fraction" -> "1.0").count() == 3)
  }

  test("boilerplate and shard-shuffle steps") {
    val df = Seq(
      (1L, "cookie banner alpha beta"),
      (2L, "cookie banner gamma delta"),
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text").withColumn("source", lit("web"))
    def step(d: org.apache.spark.sql.DataFrame, t: String, cfg: (String, String)*) =
      CurationPipeline.applyStep(spark, d, CurationPipeline.StepDef(t, cfg.toMap),
        "doc_id", "text")
    // the shared 2-word segment crosses min-doc-freq 2 and drops EVERYWHERE;
    // non-text columns ride along
    val bp = step(df, "boilerplate", "window" -> "2", "min-doc-freq" -> "2")
    assert(bp.columns.toSet == Set("doc_id", "source", "text"))
    val texts = bp.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts == Map(1L -> "alpha beta", 2L -> "gamma delta",
      3L -> "unrelated words entirely here"))
    // shard-shuffle appends deterministic (shard, pos); two runs agree
    val sh1 = step(df, "shard-shuffle", "shards" -> "2")
    assert(sh1.columns.toSet == Set("doc_id", "source", "text", "shard", "pos"))
    val sh2 = step(df, "shard-shuffle", "shards" -> "2")
    assert(sh1.select($"doc_id", $"shard", $"pos").as[(Long, Long, Int)].collect().toSet ==
      sh2.select($"doc_id", $"shard", $"pos").as[(Long, Long, Int)].collect().toSet)
  }

  test("perplexity-filter step: LM-unlikely docs drop, short docs configurable") {
    def step(d: org.apache.spark.sql.DataFrame, cfg: (String, String)*) =
      CurationPipeline.applyStep(spark, d,
        CurationPipeline.StepDef("perplexity-filter", cfg.toMap), "doc_id", "text")
    val df = Seq(
      (1L, "the cat sat on the mat", "ref"),
      (2L, "the cat sat on the mat", "cand"),     // in-model: high score
      (3L, "zz qq vv xx yy ww uu tt", "cand"),    // all OOV: floor score
      (4L, "hi", "cand")                           // <2 tokens: unjudged
    ).toDF("doc_id", "text", "split")
    // reference-filter trains on the in-frame slice; doc 3 is LM-impossible
    val out = step(df, "reference-filter" -> "split = 'ref'",
      "min-lp-avg" -> "-1.2")
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L),
      "OOV doc must drop, short doc survives by default")
    val strict = step(df, "reference-filter" -> "split = 'ref'",
      "min-lp-avg" -> "-1.2", "keep-short" -> "false")
    assert(strict.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "keep-short=false drops unjudged rows")
    // a reference parquet path works too
    val refPath = Files.createTempDirectory("pplx_ref").toString
    df.filter($"split" === "ref").write.mode("overwrite").parquet(refPath)
    val viaPath = step(df, "reference" -> refPath, "min-lp-avg" -> "-1.2")
    assert(viaPath.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // missing config is loud
    intercept[IllegalArgumentException](step(df))
  }

  test("mix step: per-source weights via the oracle-checked stratified sampler") {
    val corpus = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "web" else "books", s"document body number $i here"))
      .toDF("doc_id", "source", "text")
    def step(cfg: (String, String)*) =
      CurationPipeline.applyStep(spark, corpus,
        CurationPipeline.StepDef("mix", cfg.toMap), "doc_id", "text")
    val mixed = step("by" -> "source", "web" -> "0.25", "books" -> "1.0")
    val bySource = mixed.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(bySource("books") == 200L) // weight 1.0 keeps everything
    assert(bySource("web") > 20L && bySource("web") < 80L) // ~25% of 200
    // equals the underlying operator exactly (same 1/2048th arithmetic)
    val direct = TrainingData.stratifiedSample(
      corpus, "doc_id", "source", Map("web" -> 512, "books" -> 2048), 2048)
    assert(mixed.select($"doc_id").as[Long].collect().toSet ==
      direct.select($"doc_id").as[Long].collect().toSet)
    // default applies to unlisted strata; deterministic across calls
    val defaulted = step("by" -> "source", "web" -> "0.25", "default" -> "0.0")
    assert(defaulted.select($"source").distinct().as[String].collect().toSeq == Seq("web"))
    // upsampling weights are rejected with the epoch guidance
    val e = intercept[IllegalArgumentException](step("web" -> "2.0").count())
    assert(e.getMessage.contains("epoch"))
  }
}
