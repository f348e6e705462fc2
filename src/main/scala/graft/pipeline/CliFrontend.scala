package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.yaml.snakeyaml.Yaml

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The command-line entry point: `graft-cdc <pipeline.yaml> [flags]` — the
  * Spark form of the reference CLI module
  * (`flink-cdc-cli/.../CliFrontendOptions.java:24-120`,
  * `CliFrontend.java:67-160`, `CliExecutor.java:68-105`).
  *
  * Flag surface mirrors `CliFrontendOptions` one for one:
  *  - `--global-config <file>` — pipeline defaults merged UNDER the
  *    definition's own `pipeline:` block (user wins), defaulting to
  *    `$GRAFT_CDC_HOME/conf/graft-cdc.yaml` the way the reference falls back
  *    to `$FLINK_CDC_HOME/conf/flink-cdc.yaml`.
  *  - `-D key=value` — dynamic runtime config (the Flink-config analog),
  *    applied to the Spark conf; `parallelism.default` maps to
  *    `spark.sql.shuffle.partitions` (the one Flink key with a direct Spark
  *    twin), everything else passes through verbatim.
  *  - `-s/--from-savepoint <dir>`, `-cm/--claim-mode claim|no_claim|legacy`,
  *    `-n/--allow-nonRestored-state` — restore semantics below.
  *  - `--use-mini-cluster` / `-t/--target local` — only local execution
  *    exists in this environment; any other target refuses loudly instead of
  *    pretending to submit (`CliExecutor.run`'s yarn/k8s arms need a cluster).
  *  - `--jar`, `--flink-home` — accepted for CLI compatibility and ignored:
  *    a Spark library needs no side-loaded connector jars and no Flink home.
  *
  * Savepoint restore, in Structured-Streaming terms: a "savepoint" is a
  * streaming checkpoint directory. State identity is an OPERATOR UID like the
  * reference's (`PipelineOptions.java:96-115` — `operator.uid.prefix`,
  * `schema.operator.uid`): the CLI stamps `graft-pipeline-manifest.json` into
  * every checkpoint it creates and validates it on restore, because offsets
  * restore positionally — a checkpoint of a DIFFERENT pipeline would replay
  * cleanly but mean the wrong thing (the exact hazard Flink's uid matching
  * guards against).
  *  - uid mismatch, no `-n`: refuse loudly.
  *  - uid mismatch with `-n`: discard the savepoint (start fresh at the
  *    pipeline's own `checkpoint.dir`) — Flink's "skip state that cannot be
  *    restored".
  *  - `no_claim` (default): COPY the savepoint into the pipeline's own
  *    `checkpoint.dir` and run there — the original files are never touched,
  *    matching "the first checkpoint will not reuse any files".
  *  - `claim`: run IN the savepoint directory; the pipeline takes ownership
  *    (Structured Streaming compacts/deletes its own log files there).
  *  - `legacy`: run in place without recording ownership.
  */
object CliFrontend {

  val ClaimModes: Set[String] = Set("claim", "no_claim", "legacy")

  /** Parsed flag set (`CliFrontendOptions.initializeOptions`). */
  final case class CliConfig(
      pipelinePath: Option[String] = None,
      globalConfig: Option[String] = None,
      dynamicConf: Map[String, String] = Map.empty,
      fromSavepoint: Option[String] = None,
      claimMode: String = "no_claim",
      allowNonRestored: Boolean = false,
      useMiniCluster: Boolean = false,
      target: Option[String] = None,
      jars: Seq[String] = Seq.empty,
      flinkHome: Option[String] = None,
      help: Boolean = false) {
    /** `--use-mini-cluster` forces local like `CliFrontend.overrideFlinkConfiguration`. */
    def deploymentTarget: String = if (useMiniCluster) "local" else target.getOrElse("local")
  }

  /** What `run` hands back — the reference's `PipelineExecution.ExecutionInfo`
    * (job id + description) plus the DDL count the drain applied.
    */
  final case class ExecutionInfo(id: String, description: String, schemaChangesApplied: Int)

  def parseArgs(args: Seq[String]): CliConfig = {
    var c = CliConfig()
    var i = 0
    def value(flag: String): String = {
      i += 1
      if (i >= args.length) throw new IllegalArgumentException(s"$flag requires a value")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "-h" | "--help"              => c = c.copy(help = true)
        case "--global-config"            => c = c.copy(globalConfig = Some(value("--global-config")))
        case "--flink-home"               => c = c.copy(flinkHome = Some(value("--flink-home")))
        case "--jar"                      => c = c.copy(jars = c.jars :+ value("--jar"))
        case "-t" | "--target"            => c = c.copy(target = Some(value("--target")))
        case "--use-mini-cluster"         => c = c.copy(useMiniCluster = true)
        case "-s" | "--from-savepoint"    => c = c.copy(fromSavepoint = Some(value("--from-savepoint")))
        case "-cm" | "--claim-mode" =>
          val m = value("--claim-mode").toLowerCase
          if (!ClaimModes.contains(m)) throw new IllegalArgumentException(
            s"unknown claim mode '$m' (supported: ${ClaimModes.toSeq.sorted.mkString(", ")})")
          c = c.copy(claimMode = m)
        case "-n" | "--allow-nonRestored-state" => c = c.copy(allowNonRestored = true)
        case d if d.startsWith("-D") =>
          // both `-Dk=v` and `-D k=v` (commons-cli accepts the split form)
          val kv = if (d == "-D") value("-D") else d.drop(2)
          val eq = kv.indexOf('=')
          if (eq <= 0 || eq == kv.length - 1 ||
              kv.take(eq).trim.isEmpty || kv.drop(eq + 1).trim.isEmpty)
            throw new IllegalArgumentException(
              s"null or white space argument for key or value: $kv")
          c = c.copy(dynamicConf = c.dynamicConf + (kv.take(eq).trim -> kv.drop(eq + 1).trim))
        case flag if flag.startsWith("-") =>
          throw new IllegalArgumentException(s"unknown flag '$flag' (try --help)")
        case path =>
          // first unparsed argument = the pipeline definition file
          if (c.pipelinePath.isDefined) throw new IllegalArgumentException(
            s"multiple pipeline definition files: ${c.pipelinePath.get} and $path")
          c = c.copy(pipelinePath = Some(path))
      }
      i += 1
    }
    c
  }

  val helpText: String =
    """Usage: graft-cdc <pipeline.yaml> [flags]
      |    -h, --help                    Display help message
      |    --global-config <file>        Global pipeline configuration (defaults merged
      |                                  under the definition's pipeline block; falls back
      |                                  to $GRAFT_CDC_HOME/conf/graft-cdc.yaml)
      |    -D key=value                  Dynamic runtime config (repeatable)
      |    -t, --target <name>           Deployment target (only 'local' is available)
      |    --use-mini-cluster            Run locally (forces --target local)
      |    -s, --from-savepoint <dir>    Checkpoint directory to restore from
      |    -cm, --claim-mode <mode>      claim | no_claim (default) | legacy
      |    -n, --allow-nonRestored-state Discard savepoint state that does not match
      |                                  this pipeline's operator uid
      |    --jar <file>                  Accepted and ignored (no side-loaded jars)
      |    --flink-home <dir>            Accepted and ignored
      |""".stripMargin

  // ---------------------------------------------------------------- global config

  /** `--global-config`, else `$GRAFT_CDC_HOME/conf/graft-cdc.yaml`
    * (`CliFrontend.getGlobalConfig`). The file is a flat map of pipeline
    * config keys; a file wrapping them in a `pipeline:` block also works.
    */
  def loadGlobalConfig(cli: CliConfig): Map[String, String] = {
    val path = cli.globalConfig.orElse(
      sys.env.get("GRAFT_CDC_HOME")
        .map(h => s"$h/conf/graft-cdc.yaml")
        .filter(p => Files.exists(Paths.get(p))))
    path match {
      case None => Map.empty
      case Some(p) =>
        if (!Files.exists(Paths.get(p))) throw new IllegalArgumentException(
          s"global config file $p does not exist")
        val raw = new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)
        val root = Option(new Yaml().load[Any](raw)) match {
          case Some(m: java.util.Map[_, _]) =>
            m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
          case Some(other) => throw new IllegalArgumentException(
            s"global config must be a YAML mapping, got $other")
          case None => Map.empty[String, Any]
        }
        val flat = root.get("pipeline") match {
          case Some(m: java.util.Map[_, _]) =>
            m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
          case _ => root
        }
        flat.collect { case (k, v) if v != null => k -> String.valueOf(v) }
    }
  }

  /** Merge order from `YamlPipelineDefinitionParser.parse(path, globalConfig)`:
    * global fills, the definition's own `pipeline:` block wins.
    */
  def mergeGlobal(pdef: PipelineDef, global: Map[String, String]): PipelineDef =
    pdef.copy(config = global ++ pdef.config)

  // ---------------------------------------------------------------- state identity

  /** The checkpoint's state identity — the savepoint-matching role of Flink
    * operator uids. `schema.operator.uid` overrides the whole uid;
    * `operator.uid.prefix` prefixes the derived one. Setting both is the
    * reference's config error (`PipelineOptions.java:96-115`,
    * `FlinkPipelineComposer.java:135-146`).
    */
  def operatorUid(pdef: PipelineDef): String = {
    if (pdef.config.contains("schema.operator.uid") &&
        pdef.config.contains("operator.uid.prefix"))
      throw new IllegalArgumentException(
        "Only one of the operator.uid.prefix and schema.operator.uid pipeline options can be set.")
    pdef.config.getOrElse("schema.operator.uid", {
      val prefix = pdef.config.getOrElse("operator.uid.prefix", "graft")
      // the config keys that IDENTIFY the stream, per source family — a
      // kafka source has no sourceId, so topic/partition must feed the uid
      // or two kafka pipelines would share an identity and the savepoint
      // guard could not tell their offsets apart
      val cfg = pdef.source.config
      val sourceId = cfg.get("sourceId")
        .orElse(cfg.get("topic").map(t => s"$t/${cfg.getOrElse("partition", "0")}"))
        .orElse(cfg.get("path"))
        .getOrElse("")
      s"$prefix:${pdef.source.sourceType}:$sourceId:${pdef.sink.sinkType}"
    })
  }

  private val ManifestName = "graft-pipeline-manifest.json"
  private val mapper = new ObjectMapper()

  final case class StateManifest(uid: String, pipelineName: String, claimMode: String)

  def writeManifest(checkpointDir: String, m: StateManifest): Unit = {
    val n = mapper.createObjectNode()
    n.put("uid", m.uid); n.put("pipelineName", m.pipelineName); n.put("claimMode", m.claimMode)
    Files.createDirectories(Paths.get(checkpointDir))
    Files.write(Paths.get(checkpointDir, ManifestName),
      mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8))
  }

  def readManifest(checkpointDir: String): Option[StateManifest] = {
    val p = Paths.get(checkpointDir, ManifestName)
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readAllBytes(p))
      Some(StateManifest(n.get("uid").asText(), n.get("pipelineName").asText(),
        n.get("claimMode").asText()))
    }
  }

  // ---------------------------------------------------------------- savepoint restore

  /** Resolve `--from-savepoint` into the pipeline's effective
    * `checkpoint.dir` per the claim mode, validating state identity first.
    * Returns the pipeline definition to actually run.
    */
  def resolveSavepoint(pdef: PipelineDef, cli: CliConfig): PipelineDef = cli.fromSavepoint match {
    case None => pdef
    case Some(sp) =>
      if (!Files.isDirectory(Paths.get(sp))) throw new IllegalArgumentException(
        s"savepoint $sp does not exist or is not a directory")
      val uid = operatorUid(pdef)
      val matches = readManifest(sp) match {
        case Some(m) if m.uid == uid => true
        case Some(m) =>
          if (!cli.allowNonRestored) throw new IllegalStateException(
            s"savepoint $sp holds state for operator uid '${m.uid}' but this pipeline's uid " +
              s"is '$uid'; restoring would replay another pipeline's offsets. Pass " +
              "--allow-nonRestored-state to discard it, or align operator.uid.prefix / " +
              "schema.operator.uid with the job that wrote the savepoint")
          false
        // a bare checkpoint dir written outside the CLI: restorable (the
        // reference's legacy path), and the manifest is stamped on this run
        case None => true
      }
      if (!matches) pdef // -n: skip the foreign state, run at the pipeline's own dir
      else cli.claimMode match {
        case "claim" | "legacy" =>
          pdef.copy(config = pdef.config + ("checkpoint.dir" -> sp))
        case "no_claim" =>
          val own = pdef.config.getOrElse("checkpoint.dir", throw new IllegalArgumentException(
            "no_claim restore copies the savepoint, so the pipeline needs its own " +
              "pipeline.checkpoint.dir (or restore in place with --claim-mode claim)"))
          val ownPath = Paths.get(own)
          val occupied = Files.exists(ownPath) && {
            val s = Files.list(ownPath)
            try s.findFirst().isPresent finally s.close()
          }
          if (occupied) throw new IllegalArgumentException(
            s"no_claim restore target $own already exists and is not empty")
          copyTree(Paths.get(sp), ownPath)
          pdef
      }
  }

  private def copyTree(from: Path, to: Path): Unit = {
    val walk = Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else { Files.createDirectories(dest.getParent); Files.copy(p, dest) }
    } finally walk.close()
  }

  // ---------------------------------------------------------------- execution

  /** Apply `-D` overrides (`CliFrontend.overrideFlinkConfiguration`):
    * `parallelism.default` → shuffle partitions, the rest verbatim.
    */
  def applyDynamicConf(spark: SparkSession, conf: Map[String, String]): Unit =
    conf.foreach {
      case ("parallelism.default", v) => spark.conf.set("spark.sql.shuffle.partitions", v)
      case (k, v)                     => spark.conf.set(k, v)
    }

  /** Parse + merge + restore + run to completion of available data —
    * `CliFrontend.main` minus the process boundary, so tests and embedding
    * callers get the same path `main` uses.
    */
  def run(args: Seq[String])(implicit spark: SparkSession): Option[ExecutionInfo] = {
    val cli = parseArgs(args)
    if (cli.help || args.isEmpty) { println(helpText); return None }
    val path = cli.pipelinePath.getOrElse(throw new IllegalArgumentException(
      "Missing pipeline definition file path in arguments. "))
    if (cli.deploymentTarget != "local") throw new IllegalArgumentException(
      s"Deployment target ${cli.deploymentTarget} is not supported in this environment " +
        "(no cluster to submit to); use --use-mini-cluster or --target local")
    applyDynamicConf(spark, cli.dynamicConf)

    val yamlText = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val merged = mergeGlobal(YamlPipelineParser.parse(yamlText), loadGlobalConfig(cli))

    if (merged.runtimeMode == "BATCH") {
      // batch jobs have no restorable streaming state (the reference's batch
      // runtime mode runs an unkeyed bounded topology)
      if (cli.fromSavepoint.isDefined) throw new IllegalArgumentException(
        "--from-savepoint applies to STREAMING pipelines; this one is execution.runtime-mode: BATCH")
      val runner = new PipelineRunner(merged)
      runner.runBatch()
      return Some(ExecutionInfo(merged.name, "Batch pipeline has been executed", 0))
    }

    val pdef = resolveSavepoint(merged, cli)

    // stamp state identity on the checkpoint this run writes
    pdef.config.get("checkpoint.dir").foreach { d =>
      if (readManifest(d).isEmpty)
        writeManifest(d, StateManifest(operatorUid(pdef), pdef.name, cli.claimMode))
    }

    val runner = new PipelineRunner(pdef)
    val ddl =
      if (pdef.config.contains("checkpoint.dir")) runner.runHandlingDdl()
      else { val q = runner.run(); q.processAllAvailable(); q.stop(); 0 }
    Some(ExecutionInfo(pdef.name, "Pipeline has been submitted and drained", ddl))
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .appName("graft-cdc-cli")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    run(args.toIndexedSeq).foreach(info =>
      println(s"""Pipeline "${info.id}": ${info.description}"""))
  }
}
