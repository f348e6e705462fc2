package graft.textops

import graft.dedup.Dedup
import graft.functions.{CatalystExprs, TextFunctions}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.Yaml

import scala.jdk.CollectionConverters._

/** Declarative curation pipelines — the YAML frontend for the training-data
  * operator family, so the curation chain that `x_curate_e2e` proves
  * programmatically is available the same way CDC pipelines are: one YAML
  * file through `graft.Cli`.
  *
  * ```yaml
  * curation:
  *   input: /data/raw_docs            # parquet with id + text columns
  *   output: /data/curated
  *   id-column: doc_id                # default doc_id
  *   text-column: text                # default text
  *   steps:
  *     - type: repetition-filter      # max-top-bigram-frac, max-dup-word-frac
  *     - type: quality-filter         # min-score
  *     - type: language-filter        # lang: en
  *     - type: exact-dedup
  *     - type: span-dedup             # window: 10
  *     - type: decontaminate          # benchmark: <parquet>, k: 8
  *     - type: pii-redact
  *     - type: sample                 # fraction: 0.5
  * ```
  *
  * Every step reuses an individually oracle-checked operator. Per-step row
  * counts come from `Dataset.observe` counters evaluated DURING the single
  * write action — one pass over the data, no per-step recount jobs (a
  * per-step `count()` would re-execute the growing chain once per step:
  * quadratic at 100 TB).
  */
object CurationPipeline {

  final case class StepDef(stepType: String, config: Map[String, String])
  final case class CurationDef(
      input: String,
      output: String,
      idCol: String,
      textCol: String,
      steps: Seq[StepDef],
      inputFormat: String = "parquet",
      incremental: Boolean = false,
      outputFormat: String = "parquet",
      continuous: Boolean = false)

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> (vv: Any) }.toMap
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected a YAML map, got $other")
  }

  /** Is this YAML a curation pipeline (vs a CDC pipeline)? */
  def isCuration(yaml: String): Boolean =
    asMap(new Yaml().load[Any](yaml)).contains("curation")

  def parse(yaml: String): CurationDef = {
    val c = asMap(asMap(new Yaml().load[Any](yaml)).getOrElse("curation",
      throw new IllegalArgumentException("Missing required section 'curation'")))
    def req(key: String): String = c.getOrElse(key,
      throw new IllegalArgumentException(s"curation requires '$key'")).toString
    val steps = c.getOrElse("steps", java.util.Collections.emptyList[Any]()) match {
      case l: java.util.List[_] => l.asScala.toSeq.map { s =>
        val m = asMap(s)
        StepDef(
          m.getOrElse("type",
            throw new IllegalArgumentException("curation step requires 'type'")).toString,
          (m - "type").map { case (k, v) => k -> v.toString })
      }
      case other => throw new IllegalArgumentException(s"'steps' must be a list, got $other")
    }
    require(steps.nonEmpty, "curation requires at least one step")
    val inputFormat = c.getOrElse("input-format", "parquet").toString
    require(Seq("parquet", "lakehouse").contains(inputFormat),
      s"input-format must be parquet or lakehouse, got $inputFormat")
    val incremental = c.getOrElse("incremental", "false").toString.toBoolean
    require(!incremental || inputFormat == "lakehouse",
      "incremental curation requires input-format: lakehouse (the change feed)")
    val outputFormat = c.getOrElse("output-format", "parquet").toString
    require(Seq("parquet", "lakehouse").contains(outputFormat),
      s"output-format must be parquet or lakehouse, got $outputFormat")
    val output = req("output")
    // replay safety is not optional: a crash between the output write and the
    // cursor advance re-curates and re-appends the increment unless either
    // (a) the cursor rides IN the output commit (lakehouse output), or
    // (b) a dedup step against the output absorbs the replay
    require(!incremental || outputFormat == "lakehouse" ||
      steps.exists(s => s.stepType == "incremental-dedup" &&
        s.config.get("history").contains(output)),
      "incremental curation must be replay-safe: use output-format: lakehouse " +
        "(the change-feed cursor commits atomically with the output) or add an " +
        "incremental-dedup step with history = the output path")
    val continuous = c.getOrElse("continuous", "false").toString.toBoolean
    require(!continuous || (inputFormat == "lakehouse" && outputFormat == "lakehouse"),
      "continuous curation requires input-format: lakehouse (the streaming " +
        "change feed) and output-format: lakehouse (atomic per-batch commits)")
    CurationDef(
      input = req("input"),
      output = output,
      idCol = c.getOrElse("id-column", "doc_id").toString,
      textCol = c.getOrElse("text-column", "text").toString,
      steps = steps,
      inputFormat = inputFormat,
      incremental = incremental,
      outputFormat = outputFormat,
      continuous = continuous)
  }

  /** One step of the chain; every branch is a tested operator. */
  def applyStep(
      spark: SparkSession,
      df: DataFrame,
      step: StepDef,
      idCol: String,
      textCol: String): DataFrame = {
    def cfg(key: String, default: String): String = step.config.getOrElse(key, default)
    step.stepType match {
      case "repetition-filter" =>
        // Gopher-style repetition gates from the one-pass native stats
        val maxTbf = cfg("max-top-bigram-frac", "0.10").toDouble
        val maxDwf = cfg("max-dup-word-frac", "0.60").toDouble
        val s = CatalystExprs.repetitionStats(col(textCol))
        df.withColumn("__s", s)
          .filter(
            (col("__s.tokens") === 0) ||
            (col("__s.top_bigram") * 2.0 / col("__s.tokens") <= maxTbf &&
              lit(1.0) - col("__s.uniq_words").cast("double") / col("__s.tokens") <= maxDwf))
          .drop("__s")
      case "quality-filter" =>
        df.filter(TextFunctions.qualityScore(col(textCol)) >= cfg("min-score", "0.8").toDouble)
      case "language-filter" =>
        df.filter(TextFunctions.langId(col(textCol)) === cfg("lang", "en"))
      case "exact-dedup" =>
        val survivors = Dedup.exactByFingerprint(df, idCol, textCol).select(col(idCol))
        df.join(survivors, Seq(idCol), "left_semi")
      case "span-dedup" =>
        // rebuilt text replaces the original; non-text columns ride along
        val rebuilt = Dedup.spanDedup(df, idCol, textCol, cfg("window", "10").toInt)
          .drop("kept_spans")
        df.drop(textCol).join(rebuilt, Seq(idCol))
      case "boilerplate" =>
        // corpus-frequency repeated-segment removal (the C4/RefinedWeb
        // rule): segments in >= min-doc-freq distinct documents drop from
        // ALL of them (contrast span-dedup's keep-first); documents that
        // lose every segment drop out; rebuilt text replaces the original
        val rebuilt = Dedup.removeBoilerplate(df, idCol, textCol,
          cfg("window", "10").toInt, cfg("min-doc-freq", "100").toInt)
          .drop("kept_segments")
        df.drop(textCol).join(rebuilt, Seq(idCol))
      case "shard-shuffle" =>
        // terminal training-order step: every run/engine assigns the same
        // (shard, pos) — reproducible data order for the training job
        TrainingData.shardShuffle(df, idCol, cfg("shards", "1024").toInt)
      case "decontaminate" =>
        val bench = spark.read.parquet(step.config.getOrElse("benchmark",
          throw new IllegalArgumentException("decontaminate requires 'benchmark'")))
        val flagged = TrainingData.decontaminate(
          df.select(col(idCol), col(textCol)), bench,
          idCol, textCol, k = cfg("k", "8").toInt).select(col(idCol))
        df.join(flagged, Seq(idCol), "left_anti")
      case "incremental-dedup" =>
        // cross-RUN dedup: drop rows whose fingerprint already exists in a
        // history corpus (Bloom build/probe/verify — history never shuffles).
        // In an incremental pipeline the natural history is the curated
        // output itself; a missing/empty history (first run) is a no-op.
        val histPath = step.config.getOrElse("history",
          throw new IllegalArgumentException("incremental-dedup requires 'history'"))
        val hasHistory = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(histPath)) &&
          java.nio.file.Files.list(java.nio.file.Paths.get(histPath)).iterator.asScala
            .exists(_.getFileName.toString.endsWith(".parquet"))
        if (!hasHistory) df
        else Dedup.incrementalDedup(df, spark.read.parquet(histPath), idCol, textCol)
      case "pii-redact" =>
        df.withColumn(textCol, TrainingData.redactPii(col(textCol)))
      case "sample" =>
        val fraction = cfg("fraction", "0.5").toDouble
        require(fraction > 0 && fraction <= 1, s"sample fraction out of (0,1]: $fraction")
        df.filter(TrainingData.deterministicBucket(col(idCol), 2048) <
          math.round(fraction * 2048).toInt)
      case "mix" =>
        // domain mixing (the DoReMi-style source reweighting of a pretraining
        // corpus): per-stratum keep-fractions over a strata column, e.g.
        //   - type: mix
        //     by: source
        //     web: 0.25
        //     books: 1.0
        //     default: 0.5
        // Delegates to the oracle-checked stratifiedSample (map-only, exact
        // 1/2048th integer arithmetic, stable across runs). Weights are
        // DOWN-sampling fractions in [0,1]; upsampling is an epoch-level
        // concern (duplicated ids would poison every dedup step downstream).
        val by = cfg("by", "source")
        val weights = (step.config - "by" - "default").map { case (k, v) =>
          val w = v.toDouble
          require(w >= 0 && w <= 1,
            s"mix weight for '$k' out of [0,1]: $w (upsample via epochs, not rows)")
          k -> math.round(w * 2048).toInt
        }
        val default = cfg("default", "1.0").toDouble
        require(default >= 0 && default <= 1, s"mix default out of [0,1]: $default")
        TrainingData.stratifiedSample(
          df, idCol, by, weights, math.round(default * 2048).toInt)
      case "semdedup" =>
        // semantic dedup over a sidecar embedding table (SemDeDup, Abbas et
        // al. 2023): documents whose embedding has an in-cluster near-dup of
        // lower id are dropped; documents WITHOUT an embedding are kept
        // (they cannot be judged), which the anti-join on dropped ids gives
        // for free. The embedding table never rides through the text chain —
        // only its id column does.
        val embPath = step.config.getOrElse("embeddings",
          throw new IllegalArgumentException("semdedup requires 'embeddings' (parquet path)"))
        val vecCol = cfg("vector-column", "embedding")
        val embIdCol = cfg("embedding-id", idCol)
        val emb = spark.read.parquet(embPath)
          .select(col(embIdCol).as(idCol), col(vecCol))
        emb.select(col(vecCol)).head(1) match {
          case Array(first) =>
            val dim = first.getSeq[Any](0).length
            val judged = df.select(col(idCol)).join(emb, Seq(idCol))
            val dropped = Dedup.semanticDeduplicate(
              judged, idCol, vecCol, dim,
              k = cfg("clusters", "64").toInt,
              threshold = cfg("threshold", "0.95").toDouble)
              .filter(!col("kept")).select(col(idCol))
            df.join(dropped, Seq(idCol), "left_anti")
          case _ => df // empty embedding table: nothing can be judged
        }
      case "perplexity-filter" =>
        // CCNet-style LM filter: train a bigram Stupid Backoff LM on a
        // reference corpus (a parquet path, or the input itself restricted
        // by 'reference-filter'), keep documents whose mean per-bigram
        // log10 score clears 'min-lp-avg'. Rows with <2 tokens carry no
        // evidence; 'keep-short' (default true) controls their fate.
        val refDf = (step.config.get("reference"),
            step.config.get("reference-filter")) match {
          case (Some(path), _) => spark.read.parquet(path)
          case (None, Some(pred)) => df.filter(pred)
          case _ => throw new IllegalArgumentException(
            "perplexity-filter requires 'reference' (parquet path) or " +
              "'reference-filter' (SQL predicate over the input)")
        }
        val minLp = cfg("min-lp-avg", "-1.49").toDouble
        val (uni, bi, n) = PerplexityLm.train(refDf, textCol)
        val scored = PerplexityLm.score(df, idCol, textCol, uni, bi, n)
        val kept = scored.filter(col("lp_avg") >= minLp).select(col(idCol))
        if (cfg("keep-short", "true").toBoolean) {
          // unjudged (short) rows survive: anti-join on the judged-and-failed
          val failed = scored.filter(col("lp_avg") < minLp).select(col(idCol))
          df.join(failed, Seq(idCol), "left_anti")
        } else df.join(kept, Seq(idCol), "left_semi")
      case other =>
        throw new IllegalArgumentException(
          s"unknown curation step '$other' (supported: repetition-filter, quality-filter, " +
            "language-filter, exact-dedup, span-dedup, incremental-dedup, decontaminate, " +
            "pii-redact, sample, mix, semdedup, perplexity-filter)")
    }
  }

  // inside the output directory: underscore-prefixed files are invisible to
  // Spark's parquet reader (like _SUCCESS), so the output stays readable
  private def cursorFile(cdef: CurationDef): java.nio.file.Path =
    java.nio.file.Paths.get(cdef.output, "_graft_cursor")

  /** The run id under which incremental curation records its cursor as a
    * `txn` action in the output table's commits. */
  val CurationRunId = "graft-curation"

  /** Run the pipeline: read input (parquet, a lakehouse table, or — in
    * incremental mode — the lakehouse CHANGE FEED after the persisted version
    * cursor), chain the steps, write the output (append in incremental mode,
    * so each run adds only its curated increment). Returns
    * (stepLabel, rowsAfterStep) — counted by observe() metrics in the ONE
    * write pass; an already-caught-up incremental run returns `Seq.empty`.
    *
    * Replay safety of the cursor, by output format:
    *  - `lakehouse` output: the input-version cursor rides IN the output
    *    commit as a `txn` action — output rows and cursor advance are ONE
    *    atomic rename, so there is no window where one exists without the
    *    other; a crashed-then-replayed increment is skipped wholesale by the
    *    txn check. This is the default-safe mode.
    *  - `parquet` output: the cursor is a sidecar file written after the
    *    append, so a crash between the two re-curates the increment — legal
    *    only with an `incremental-dedup(history = output)` step that absorbs
    *    the replay (enforced at [[parse]] time).
    */
  def run(spark: SparkSession, cdef: CurationDef): Seq[(String, Long)] = {
    val outTable =
      if (cdef.outputFormat == "lakehouse")
        Some(new graft.sinks.LakehouseTable(spark, cdef.output))
      else None
    val observations = scala.collection.mutable.ArrayBuffer.empty[(String, Observation)]
    def observed(label: String, df: DataFrame): DataFrame = {
      val obs = Observation(s"curate-$label-${observations.size}")
      observations += ((label, obs))
      df.observe(obs, count(lit(1)).as("rows"))
    }
    // (input frame, Some((cursor before, cursor after)) when incremental)
    val (input, cursorMove): (DataFrame, Option[(Long, Long)]) = cdef.inputFormat match {
      case "lakehouse" =>
        val table = new graft.sinks.LakehouseTable(spark, cdef.input)
        if (!cdef.incremental) (table.read(), None)
        else {
          val since = outTable match {
            // the authoritative cursor is the output table's own txn record
            case Some(t) if t.latestVersion() >= 0 =>
              t.snapshot().txns.getOrElse(CurationRunId, -1L)
            case Some(_) => -1L
            case None =>
              val cf = cursorFile(cdef)
              if (java.nio.file.Files.exists(cf))
                new String(java.nio.file.Files.readAllBytes(cf), "UTF-8").trim.toLong
              else -1L
          }
          val (chg, v) = table.readChangesSince(since)
          (chg, Some((since, v)))
        }
      case _ => (spark.read.parquet(cdef.input), None)
    }
    // caught up: no new input commits, nothing to curate or write (and no
    // action will run, so build no observations — their get() would block)
    if (cursorMove.exists { case (since, v) => v <= since }) return Seq.empty
    var df = observed("input", input)
    cdef.steps.zipWithIndex.foreach { case (step, i) =>
      df = observed(s"${i + 1}:${step.stepType}",
        applyStep(spark, df, step, cdef.idCol, cdef.textCol))
    }
    outTable match {
      case Some(t) =>
        if (t.snapshot().meta.isEmpty)
          t.create(graft.core.TableSchema(df.schema, Seq.empty))
        // non-incremental = Delta-style overwrite: new files are written
        // first, then ONE commit removes the old live files and adds the new
        // ones — concurrent readers never observe an empty table, and a crash
        // mid-run leaves the previous output fully intact
        t.append(df, txn = cursorMove.map { case (_, v) => (CurationRunId, v) },
          overwrite = !cdef.incremental)
      case None =>
        df.write.mode(if (cdef.incremental) "append" else "overwrite").parquet(cdef.output)
        cursorMove.foreach { case (_, v) =>
          java.nio.file.Files.write(cursorFile(cdef), v.toString.getBytes("UTF-8"))
        }
    }
    observations.toSeq.map { case (label, obs) =>
      label -> obs.get("rows").asInstanceOf[Long]
    }
  }

  /** The run id under which CONTINUOUS curation records Spark's micro-batch
    * id as a `txn` action in the output table's commits. */
  val CurationStreamRunId = "graft-curation-stream"

  /** Run the pipeline as a STANDING StreamingQuery — the reference's
    * continuous-pipeline model (`FlinkPipelineComposer.java:115-260`: a
    * composed pipeline is one long-running job): the lakehouse input is
    * consumed through the `graft-lakehouse` streaming source (commit
    * versions = offsets, backfill from commit 0 then tail), each micro-batch
    * runs the step chain, and the output append carries Spark's batch id as
    * a `txn` action — so a crash-replayed micro-batch is skipped wholesale
    * and bronze→silver is exactly-once end to end.
    *
    * Step semantics are PER MICRO-BATCH (each batch is one curation run over
    * its increment); cross-run dedup is the `incremental-dedup` step with
    * `history` = the output, exactly as in [[run]]. The checkpoint lives
    * under the output directory (underscore-prefixed: invisible to reads).
    */
  def runContinuous(
      spark: SparkSession,
      cdef: CurationDef): org.apache.spark.sql.streaming.StreamingQuery = {
    require(cdef.inputFormat == "lakehouse" && cdef.outputFormat == "lakehouse",
      "continuous curation requires lakehouse input and output")
    val outTable = new graft.sinks.LakehouseTable(spark, cdef.output)
    val ckpt = java.nio.file.Paths.get(cdef.output, "_curation_checkpoint").toString
    spark.readStream.format("graft-lakehouse")
      .option("path", cdef.input)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        var df = batch
        cdef.steps.foreach(step =>
          df = applyStep(spark, df, step, cdef.idCol, cdef.textCol))
        if (outTable.snapshot().meta.isEmpty)
          outTable.create(graft.core.TableSchema(df.schema, Seq.empty))
        outTable.append(df, txn = Some((CurationStreamRunId, batchId)))
        ()
      }
      .start()
  }
}
