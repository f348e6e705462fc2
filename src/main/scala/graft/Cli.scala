package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{PipelineRunner, YamlPipelineParser}
import org.apache.spark.sql.SparkSession

/** CLI frontend: `graft.Cli pipeline.yaml [flags]` — the Spark form of the
  * reference's primary entry point `bin/flink-cdc.sh` → `CliFrontend.main`
  * (`flink-cdc-cli/.../CliFrontend.java`, flags in `CliFrontendOptions.java`).
  *
  * Flags (the Spark-meaningful subset of the reference's):
  *  - `--dry-run`          parse + validate + print the pipeline, don't run
  *                         (parse errors exit 1 before any cluster work)
  *  - `--master <m>`       Spark master (default `local[*]`) — the
  *                         `--use-mini-cluster` / `--target` analog
  *  - `--name <n>`         override `pipeline.name`
  *
  * Execution runs the pipeline to completion of all currently-available
  * input (`processAllAvailable`) and reports per-table sink row counts —
  * bounded sources (snapshot mode, scripted fixtures, file-based Debezium
  * capture) terminate; `pipeline.parallelism` maps to
  * `spark.sql.shuffle.partitions` for the session.
  *
  * Kept `System.exit`-free except in [[main]] so tests (and embedding apps)
  * call [[execute]] directly for the exit code.
  */
object Cli {

  private val Usage =
    "usage: graft.Cli <pipeline.yaml> [--dry-run] [--master <master>] [--name <name>]"

  final case class Args(
      yamlPath: String,
      dryRun: Boolean = false,
      master: String = "local[*]",
      name: Option[String] = None)

  def parseArgs(argv: Seq[String]): Either[String, Args] = {
    var yaml: Option[String] = None
    var dryRun = false
    var master = "local[*]"
    var name: Option[String] = None
    val it = argv.iterator
    while (it.hasNext) it.next() match {
      case "--dry-run" => dryRun = true
      case "--master" =>
        if (!it.hasNext) return Left("--master requires a value")
        master = it.next()
      case "--name" =>
        if (!it.hasNext) return Left("--name requires a value")
        name = Some(it.next())
      case flag if flag.startsWith("--") => return Left(s"unknown flag '$flag'")
      case path if yaml.isEmpty => yaml = Some(path)
      case extra => return Left(s"unexpected argument '$extra'")
    }
    yaml.toRight("missing <pipeline.yaml>").map(Args(_, dryRun, master, name))
  }

  /** Run the CLI; returns the process exit code (0 ok, 1 error, 2 usage). */
  def execute(argv: Array[String], out: String => Unit = println): Int =
    parseArgs(argv.toSeq) match {
      case Left(err) =>
        out(s"error: $err"); out(Usage); 2
      case Right(args) =>
        val path = Paths.get(args.yamlPath)
        if (!Files.isReadable(path)) { out(s"error: cannot read ${args.yamlPath}"); return 1 }
        val yamlText = new String(Files.readAllBytes(path), "UTF-8")
        // a `curation:` YAML is a training-data pipeline, not a CDC pipeline
        val isCuration =
          try graft.textops.CurationPipeline.isCuration(yamlText)
          catch { case e: Exception => out(s"error: invalid yaml: ${e.getMessage}"); return 1 }
        if (isCuration) return executeCuration(yamlText, args, out)
        val pdef0 =
          try YamlPipelineParser.parse(yamlText)
          catch { case e: Exception => out(s"error: invalid pipeline: ${e.getMessage}"); return 1 }
        val pdef = args.name.fold(pdef0)(n =>
          pdef0.copy(config = pdef0.config + ("name" -> n)))

        out(s"pipeline: ${pdef.name}")
        out(s"  source: ${pdef.source.sourceType}" +
          pdef.source.name.fold("")(n => s" ($n)"))
        out(s"  sink:   ${pdef.sink.sinkType}" + pdef.sink.name.fold("")(n => s" ($n)"))
        if (pdef.routes.nonEmpty) out(s"  routes: ${pdef.routes.size}")
        if (pdef.transforms.nonEmpty) out(s"  transforms: ${pdef.transforms.size}")
        if (pdef.udfs.nonEmpty) out(s"  udfs: ${pdef.udfs.map(_.name).mkString(", ")}")
        if (pdef.models.nonEmpty) out(s"  models: ${pdef.models.map(_.name).mkString(", ")}")
        out(s"  schema-change behavior: ${pdef.schemaChangeBehavior}")
        if (args.dryRun) { out("dry run: pipeline is valid, not started"); return 0 }

        implicit val spark: SparkSession = SparkSession.builder()
          .master(args.master)
          .appName(pdef.name)
          .config("spark.sql.session.timeZone", pdef.localTimeZone)
          .getOrCreate()
        if (pdef.config.contains("parallelism"))
          spark.conf.set("spark.sql.shuffle.partitions", pdef.parallelism)
        try {
          val runner = new PipelineRunner(pdef)
          val query = runner.run()
          query.processAllAvailable()
          query.stop()
          runner.sink match {
            case m: graft.sinks.MemoryDatabase =>
              m.tableIds.toSeq.sortBy(_.toString).foreach(t =>
                out(s"  $t: ${m.rowsOf(t).size} rows"))
            case _ => ()
          }
          out(s"pipeline '${pdef.name}' finished")
          0
        } catch {
          case e: Exception =>
            out(s"error: pipeline failed: ${e.getMessage}"); 1
        }
    }

  private def executeCuration(
      yamlText: String, args: Args, out: String => Unit): Int = {
    val cdef =
      try graft.textops.CurationPipeline.parse(yamlText)
      catch { case e: Exception => out(s"error: invalid curation: ${e.getMessage}"); return 1 }
    out(s"curation: ${cdef.input} -> ${cdef.output}")
    cdef.steps.zipWithIndex.foreach { case (s, i) =>
      val cfg = if (s.config.isEmpty) ""
        else s.config.map { case (k, v) => s"$k=$v" }.mkString(" (", ", ", ")")
      out(s"  step ${i + 1}: ${s.stepType}$cfg")
    }
    if (args.dryRun) { out("dry run: curation is valid, not started"); return 0 }
    val spark = SparkSession.builder()
      .master(args.master)
      .appName(args.name.getOrElse("graft-curation"))
      .getOrCreate()
    try {
      if (cdef.continuous) {
        // the standing-pipeline mode: runs until terminated externally
        val q = graft.textops.CurationPipeline.runContinuous(spark, cdef)
        out(s"continuous curation started (checkpoint under ${cdef.output})")
        q.awaitTermination()
        0
      } else {
        val counts = graft.textops.CurationPipeline.run(spark, cdef)
        counts.foreach { case (label, n) => out(s"  $label: $n rows") }
        out("curation finished")
        0
      }
    } catch {
      case e: Exception => out(s"error: curation failed: ${e.getMessage}"); 1
    }
  }

  def main(argv: Array[String]): Unit = {
    val code = execute(argv)
    if (code != 0) sys.exit(code)
  }
}
