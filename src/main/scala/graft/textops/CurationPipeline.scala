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
      steps: Seq[StepDef])

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
    CurationDef(
      input = req("input"),
      output = req("output"),
      idCol = c.getOrElse("id-column", "doc_id").toString,
      textCol = c.getOrElse("text-column", "text").toString,
      steps = steps)
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
      case "decontaminate" =>
        val bench = spark.read.parquet(step.config.getOrElse("benchmark",
          throw new IllegalArgumentException("decontaminate requires 'benchmark'")))
        val flagged = TrainingData.decontaminate(
          df.select(col(idCol), col(textCol)), bench,
          idCol, textCol, k = cfg("k", "8").toInt).select(col(idCol))
        df.join(flagged, Seq(idCol), "left_anti")
      case "pii-redact" =>
        df.withColumn(textCol, TrainingData.redactPii(col(textCol)))
      case "sample" =>
        val fraction = cfg("fraction", "0.5").toDouble
        require(fraction > 0 && fraction <= 1, s"sample fraction out of (0,1]: $fraction")
        df.filter(TrainingData.deterministicBucket(col(idCol), 2048) <
          math.round(fraction * 2048).toInt)
      case other =>
        throw new IllegalArgumentException(
          s"unknown curation step '$other' (supported: repetition-filter, quality-filter, " +
            "language-filter, exact-dedup, span-dedup, decontaminate, pii-redact, sample)")
    }
  }

  /** Run the pipeline: read input, chain the steps, write output parquet.
    * Returns (stepLabel, rowsAfterStep) — counted by observe() metrics in the
    * ONE write pass.
    */
  def run(spark: SparkSession, cdef: CurationDef): Seq[(String, Long)] = {
    val observations = scala.collection.mutable.ArrayBuffer.empty[(String, Observation)]
    def observed(label: String, df: DataFrame): DataFrame = {
      val obs = Observation(s"curate-$label-${observations.size}")
      observations += ((label, obs))
      df.observe(obs, count(lit(1)).as("rows"))
    }
    var df = observed("input", spark.read.parquet(cdef.input))
    cdef.steps.zipWithIndex.foreach { case (step, i) =>
      df = observed(s"${i + 1}:${step.stepType}",
        applyStep(spark, df, step, cdef.idCol, cdef.textCol))
    }
    df.write.mode("overwrite").parquet(cdef.output)
    observations.toSeq.map { case (label, obs) =>
      label -> obs.get("rows").asInstanceOf[Long]
    }
  }
}
