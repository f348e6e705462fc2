package graft.pipeline

import graft.SparkTestBase
import graft.core._
import graft.sources.cdc.{ChangeSourceRegistry, ScriptedChangeSource}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CLI front-end: flag parsing, global-config merge, dynamic config, and the
  * savepoint-restore matrix (claim / no_claim / uid mismatch / -n), mirroring
  * the reference `CliFrontendTest` surface plus the restore semantics
  * `SavepointRestoreSettings` configures.
  */
class CliFrontendSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestBase.spark

  private def write(dir: String, name: String, text: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  private def newSource(rows: Long*): ScriptedChangeSource = {
    val t = TableId.parse("app.users")
    val schema = TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType))),
      primaryKeys = Seq("id"))
    new ScriptedChangeSource(t, schema,
      rows.map(i => Map[String, Any]("id" -> i, "name" -> s"u$i")))
  }

  private def pipelineYaml(sourceId: String, sinkDir: String,
      checkpoint: Option[String] = None, name: String = "cli-e2e"): String = {
    val ck = checkpoint.map(c => s"\n  checkpoint.dir: $c").getOrElse("")
    s"""source:
       |  type: cdc
       |  sourceId: $sourceId
       |sink:
       |  type: parquet
       |  path: $sinkDir
       |pipeline:
       |  name: $name$ck
       |""".stripMargin
  }

  private def sinkIds(sinkDir: String): Seq[Long] = {
    // read the parquet sink's versioned layout directly — a fresh sink
    // instance would need CreateTable replayed to it first
    val d = Paths.get(sinkDir, "app_users")
    val v = new String(Files.readAllBytes(d.resolve("_VERSION"))).trim.toInt
    spark.read.parquet(d.resolve(s"v$v").toString)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
  }

  private def maxOffsetBatch(checkpointDir: String): Long = {
    val d = Paths.get(checkpointDir, "offsets")
    if (!Files.isDirectory(d)) -1L
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.forall(_.isDigit)).map(_.toLong).foldLeft(-1L)(math.max)
      finally s.close()
    }
  }

  test("parseArgs: the CliFrontendOptions surface") {
    val c = CliFrontend.parseArgs(Seq(
      "job.yaml", "--global-config", "/tmp/g.yaml", "-Dparallelism.default=8",
      "-D", "spark.foo=bar", "-s", "/tmp/sp", "-cm", "claim",
      "-n", "--use-mini-cluster", "--jar", "a.jar", "--jar", "b.jar",
      "--flink-home", "/opt/flink"))
    assert(c.pipelinePath.contains("job.yaml"))
    assert(c.globalConfig.contains("/tmp/g.yaml"))
    assert(c.dynamicConf == Map("parallelism.default" -> "8", "spark.foo" -> "bar"))
    assert(c.fromSavepoint.contains("/tmp/sp"))
    assert(c.claimMode == "claim")
    assert(c.allowNonRestored && c.useMiniCluster)
    assert(c.jars == Seq("a.jar", "b.jar"))
    assert(c.flinkHome.contains("/opt/flink"))
    assert(c.deploymentTarget == "local")
  }

  test("parseArgs: rejects malformed input the way commons-cli would") {
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("-D", "novalue")))
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("-D", "=v")))
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("-D", "k= ")))
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("-cm", "takeover", "x.yaml")))
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("--frobnicate")))
    intercept[IllegalArgumentException](CliFrontend.parseArgs(Seq("a.yaml", "b.yaml")))
    // no pipeline file at run time
    intercept[IllegalArgumentException](CliFrontend.run(Seq("-n")))
  }

  test("help / empty args: prints usage, runs nothing") {
    assert(CliFrontend.run(Seq.empty).isEmpty)
    assert(CliFrontend.run(Seq("--help", "job.yaml")).isEmpty)
    assert(CliFrontend.helpText.contains("--from-savepoint"))
  }

  test("non-local deployment targets refuse loudly") {
    val dir = Files.createTempDirectory("cli_target").toString
    val yaml = write(dir, "p.yaml", pipelineYaml("unused", dir))
    val e = intercept[IllegalArgumentException](
      CliFrontend.run(Seq(yaml, "--target", "yarn-application")))
    assert(e.getMessage.contains("not supported"))
    // --use-mini-cluster forces local even with a remote target configured
    assert(CliFrontend.parseArgs(
      Seq(yaml, "-t", "remote", "--use-mini-cluster")).deploymentTarget == "local")
  }

  test("global config: definition's pipeline block wins, global fills the rest") {
    val dir = Files.createTempDirectory("cli_global").toString
    val g = write(dir, "graft-cdc.yaml",
      "parallelism: 7\nname: from-global\nschema.change.behavior: EVOLVE\n")
    val global = CliFrontend.loadGlobalConfig(CliFrontend.CliConfig(globalConfig = Some(g)))
    assert(global == Map("parallelism" -> "7", "name" -> "from-global",
      "schema.change.behavior" -> "EVOLVE"))
    val pdef = YamlPipelineParser.parse(pipelineYaml("sid", "/tmp/x", name = "from-user"))
    val merged = CliFrontend.mergeGlobal(pdef, global)
    assert(merged.name == "from-user")
    assert(merged.parallelism == 7)
    assert(merged.schemaChangeBehavior == SchemaChangeBehavior.EVOLVE)
    // a global file wrapping keys in a `pipeline:` block reads identically
    val g2 = write(dir, "wrapped.yaml", "pipeline:\n  parallelism: 9\n")
    assert(CliFrontend.loadGlobalConfig(
      CliFrontend.CliConfig(globalConfig = Some(g2))) == Map("parallelism" -> "9"))
    // a missing --global-config path is an error, not silence
    intercept[IllegalArgumentException](CliFrontend.loadGlobalConfig(
      CliFrontend.CliConfig(globalConfig = Some(s"$dir/nope.yaml"))))
  }

  test("e2e: yaml file through the CLI writes the sink and stamps the manifest") {
    val dir = Files.createTempDirectory("cli_e2e").toString
    val ck = s"$dir/ck"; val out = s"$dir/out"
    ChangeSourceRegistry.register("cli-e2e", newSource(1L, 2L))
    try {
      val yaml = write(dir, "p.yaml", pipelineYaml("cli-e2e", out, Some(ck)))
      val info = CliFrontend.run(Seq(yaml, "-Dspark.graft.cli.probe=yes")).get
      assert(info.id == "cli-e2e")
      assert(sinkIds(out) == Seq(1L, 2L))
      assert(spark.conf.get("spark.graft.cli.probe") == "yes")
      val m = CliFrontend.readManifest(ck).get
      assert(m.uid == "graft:cdc:cli-e2e:parquet")
      assert(m.pipelineName == "cli-e2e")
    } finally ChangeSourceRegistry.remove("cli-e2e")
  }

  test("claim restore: runs in place and continues the checkpoint lineage") {
    val dir = Files.createTempDirectory("cli_claim").toString
    val ck = s"$dir/ck"; val out = s"$dir/out"
    val src = newSource(1L, 2L)
    ChangeSourceRegistry.register("cli-claim", src)
    try {
      val yaml1 = write(dir, "p1.yaml", pipelineYaml("cli-claim", out, Some(ck)))
      CliFrontend.run(Seq(yaml1))
      val batchesBefore = maxOffsetBatch(ck)
      assert(batchesBefore >= 0)
      src.append(DataChangeEvent.insert(
        TableId.parse("app.users"), Map("id" -> 3L, "name" -> "u3")))
      // restore yaml has NO checkpoint.dir of its own — the savepoint supplies it
      val yaml2 = write(dir, "p2.yaml", pipelineYaml("cli-claim", out))
      CliFrontend.run(Seq(yaml2, "--from-savepoint", ck, "--claim-mode", "claim"))
      assert(sinkIds(out) == Seq(1L, 2L, 3L))
      assert(maxOffsetBatch(ck) > batchesBefore,
        "a claimed restore must CONTINUE the lineage, not restart at batch 0")
    } finally ChangeSourceRegistry.remove("cli-claim")
  }

  test("no_claim restore: copies the savepoint, original untouched; occupied target refuses") {
    val dir = Files.createTempDirectory("cli_noclaim").toString
    val ck1 = s"$dir/ck1"; val ck2 = s"$dir/ck2"; val out = s"$dir/out"
    val src = newSource(1L, 2L)
    ChangeSourceRegistry.register("cli-noclaim", src)
    try {
      CliFrontend.run(Seq(write(dir, "p1.yaml", pipelineYaml("cli-noclaim", out, Some(ck1)))))
      val spBatches = maxOffsetBatch(ck1)
      src.append(DataChangeEvent.insert(
        TableId.parse("app.users"), Map("id" -> 3L, "name" -> "u3")))
      val yaml2 = write(dir, "p2.yaml", pipelineYaml("cli-noclaim", out, Some(ck2)))
      CliFrontend.run(Seq(yaml2, "-s", ck1)) // no_claim is the default
      assert(sinkIds(out) == Seq(1L, 2L, 3L))
      // the savepoint did not advance; the copy did
      assert(maxOffsetBatch(ck1) == spBatches, "no_claim must leave the savepoint pristine")
      assert(maxOffsetBatch(ck2) > spBatches)
      // restoring into a non-empty target refuses
      val e = intercept[IllegalArgumentException](
        CliFrontend.run(Seq(yaml2, "-s", ck1)))
      assert(e.getMessage.contains("not empty"))
      // and a restore without a pipeline checkpoint.dir has nowhere to copy to
      val yaml3 = write(dir, "p3.yaml", pipelineYaml("cli-noclaim", out))
      assert(intercept[IllegalArgumentException](
        CliFrontend.run(Seq(yaml3, "-s", ck1))).getMessage.contains("checkpoint.dir"))
    } finally ChangeSourceRegistry.remove("cli-noclaim")
  }

  test("KILL mid-batch: claim and no_claim restores redeliver exactly once") {
    // The crash window that matters: the micro-batch's SINK write landed
    // but its checkpoint commit did not (a kill between the sink flush
    // and commits/N). Structured Streaming then re-delivers batch N on
    // restart — the restore must absorb the redelivery (PK-upsert sink),
    // leaving the oracle state exactly once, under BOTH claim modes.
    val dir = Files.createTempDirectory("cli_kill").toString
    val ck = s"$dir/ck"; val ck2 = s"$dir/ck2"; val out = s"$dir/out"
    val t = TableId.parse("app.users")
    val src = newSource(1L, 2L)
    ChangeSourceRegistry.register("cli-kill", src)
    try {
      CliFrontend.run(Seq(write(dir, "p1.yaml",
        pipelineYaml("cli-kill", out, Some(ck)))))
      src.append(DataChangeEvent.insert(t, Map("id" -> 3L, "name" -> "u3")))
      CliFrontend.run(Seq(write(dir, "p2.yaml", pipelineYaml("cli-kill", out)),
        "-s", ck, "-cm", "claim"))
      assert(sinkIds(out) == Seq(1L, 2L, 3L))
      val lastBatch = maxOffsetBatch(ck)
      // the kill: offsets/N exists, commits/N does not, sink already wrote.
      // (the Hadoop local FS keeps a .N.crc checksum sidecar beside each
      // commit file — a real kill loses both, and leaving the stale crc
      // would fail the re-commit's rename)
      def killCommit(ckDir: String): Unit = {
        Files.delete(Paths.get(ckDir, "commits", lastBatch.toString))
        Files.deleteIfExists(Paths.get(ckDir, "commits", s".$lastBatch.crc"))
      }
      killCommit(ck)

      // rows appended AFTER the kill must flow in the SAME restore — the
      // redelivered chunk re-read reports a fresh HW whose output the
      // replay-skipping sink discards; without the restart HW seal, the
      // log-phase suppression would silently drop exactly these rows
      src.append(DataChangeEvent.insert(t, Map("id" -> 4L, "name" -> "u4")))

      // claim restore after the kill: batch N re-delivers IN PLACE
      CliFrontend.run(Seq(write(dir, "p3.yaml", pipelineYaml("cli-kill", out)),
        "-s", ck, "-cm", "claim"))
      assert(sinkIds(out) == Seq(1L, 2L, 3L, 4L),
        "redelivery absorbed exactly once AND post-kill rows must flow")
      assert(Files.exists(Paths.get(ck, "commits", lastBatch.toString)),
        "the re-run must commit the killed batch")

      // kill again (the NEWEST batch — the claim restore advanced the
      // lineage), restore with no_claim into a fresh dir: the COPY
      // carries the torn state, re-runs the batch there, and the
      // savepoint itself stays torn (pristine = untouched by the restore)
      val lastBatch2 = maxOffsetBatch(ck)
      Files.delete(Paths.get(ck, "commits", lastBatch2.toString))
      Files.deleteIfExists(Paths.get(ck, "commits", s".$lastBatch2.crc"))
      CliFrontend.run(Seq(write(dir, "p4.yaml",
        pipelineYaml("cli-kill", out, Some(ck2))), "-s", ck))
      assert(sinkIds(out) == Seq(1L, 2L, 3L, 4L),
        "no_claim redelivery must be absorbed exactly once")
      assert(!Files.exists(Paths.get(ck, "commits", lastBatch2.toString)),
        "no_claim must leave the savepoint exactly as the kill left it")
      assert(Files.exists(Paths.get(ck2, "commits", lastBatch2.toString)),
        "the copy must carry and then commit the killed batch")
    } finally ChangeSourceRegistry.remove("cli-kill")
  }

  test("execution.runtime-mode BATCH: bounded one-shot run; savepoint flags refuse") {
    val dir = Files.createTempDirectory("cli_batch").toString
    val out = s"$dir/out"
    ChangeSourceRegistry.register("cli-batch", newSource(1L, 2L, 3L))
    try {
      val yaml = write(dir, "p.yaml",
        s"""source:
           |  type: cdc
           |  sourceId: cli-batch
           |sink:
           |  type: parquet
           |  path: $out
           |pipeline:
           |  name: cli-batch
           |  execution.runtime-mode: BATCH
           |""".stripMargin)
      val info = CliFrontend.run(Seq(yaml)).get
      assert(info.description.contains("Batch"))
      assert(sinkIds(out) == Seq(1L, 2L, 3L))
      // batch mode has no restorable streaming state
      val e = intercept[IllegalArgumentException](
        CliFrontend.run(Seq(yaml, "-s", s"$dir/sp")))
      assert(e.getMessage.contains("BATCH"))
      // and an unknown mode refuses at the definition level
      intercept[IllegalArgumentException](
        YamlPipelineParser.parse(pipelineYaml("cli-batch", out))
          .copy(config = Map("execution.runtime-mode" -> "MICRO")).runtimeMode)
    } finally ChangeSourceRegistry.remove("cli-batch")
  }

  test("uid mismatch: refuses without -n, discards the savepoint with -n") {
    val dir = Files.createTempDirectory("cli_uid").toString
    val sp = s"$dir/sp"; val ck = s"$dir/ck"; val out = s"$dir/out"
    Files.createDirectories(Paths.get(sp))
    CliFrontend.writeManifest(sp,
      CliFrontend.StateManifest("graft:cdc:someone-else:parquet", "other", "no_claim"))
    ChangeSourceRegistry.register("cli-uid", newSource(1L, 2L))
    try {
      val yaml = write(dir, "p.yaml", pipelineYaml("cli-uid", out, Some(ck)))
      val e = intercept[IllegalStateException](CliFrontend.run(Seq(yaml, "-s", sp)))
      assert(e.getMessage.contains("someone-else"))
      assert(e.getMessage.contains("allow-nonRestored-state"))
      // -n: the foreign state is skipped, the pipeline starts FRESH at its own dir
      CliFrontend.run(Seq(yaml, "-s", sp, "-n"))
      assert(sinkIds(out) == Seq(1L, 2L))
      assert(maxOffsetBatch(ck) >= 0, "fresh lineage at the pipeline's own checkpoint.dir")
      // an explicit schema.operator.uid overrides the derived identity
      val pdef = YamlPipelineParser.parse(pipelineYaml("cli-uid", out))
      assert(CliFrontend.operatorUid(pdef.copy(
        config = pdef.config + ("schema.operator.uid" -> "pinned"))) == "pinned")
      assert(CliFrontend.operatorUid(pdef.copy(
        config = pdef.config + ("operator.uid.prefix" -> "teamA")))
        == "teamA:cdc:cli-uid:parquet")
      // setting both uid options is the reference's config error
      intercept[IllegalArgumentException](CliFrontend.operatorUid(pdef.copy(
        config = pdef.config +
          ("operator.uid.prefix" -> "a") + ("schema.operator.uid" -> "b"))))
      // kafka sources identify by topic/partition, not sourceId — two
      // pipelines on different topics must NOT share a savepoint identity
      val kdef = YamlPipelineParser.parse(
        "source:\n  type: kafka\n  topic: tA\nsink:\n  type: values\n")
      assert(CliFrontend.operatorUid(kdef) == "graft:kafka:tA/0:values")
    } finally ChangeSourceRegistry.remove("cli-uid")
  }
}
