package graft.pipeline

import java.nio.file.Files

import graft.{Cli, SparkTestBase}
import graft.core.{DataChangeEvent, TableId, TableSchema}
import graft.sources.cdc.{ChangeSourceRegistry, ScriptedChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CLI frontend behavior — the `CliFrontend`/`CliFrontendOptions` analog:
  * usage errors, parse validation (dry run), and a full yaml-to-sink run.
  */
class CliSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def collectOut(argv: Array[String]): (Int, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.execute(argv, buf += _)
    (code, buf.toSeq)
  }

  private def writeYaml(text: String): String = {
    val f = Files.createTempFile("cli-pipeline", ".yaml")
    Files.write(f, text.getBytes("UTF-8"))
    f.toString
  }

  test("usage errors exit 2, unreadable file exits 1, bad yaml exits 1") {
    assert(collectOut(Array.empty)._1 == 2)
    assert(collectOut(Array("--unknown-flag", "x.yaml"))._1 == 2)
    assert(collectOut(Array("--master"))._1 == 2)
    assert(collectOut(Array("/nonexistent/pipeline.yaml"))._1 == 1)
    val bad = writeYaml("sink:\n  type: values\n") // missing source
    assert(collectOut(Array(bad))._1 == 1)
  }

  test("--dry-run validates and prints the pipeline without running it") {
    val yaml = writeYaml(
      """source:
        |  type: cdc
        |  sourceId: cli-dry
        |sink:
        |  type: values
        |pipeline:
        |  name: dry-pipe
        |""".stripMargin)
    // sourceId is NOT registered: dry run must still pass (parse-only)
    val (code, out) = collectOut(Array(yaml, "--dry-run"))
    assert(code == 0, out.mkString("\n"))
    assert(out.exists(_.contains("pipeline: dry-pipe")))
    assert(out.exists(_.contains("dry run")))
  }

  test("standalone run: debezium-file source needs no in-process registration") {
    spark
    val dir = Files.createTempDirectory("cli-dbz")
    def src(pos: Long) =
      s""""source":{"version":"2.4.0","connector":"mysql","name":"t","ts_ms":$pos,"snapshot":"false","db":"filedb","table":"items","server_id":1,"gtid":null,"file":"mysql-bin.000001","pos":$pos,"row":0}"""
    val lines = Seq(
      // schema-wrapped and bare records in the same capture
      s"""{"schema":{"type":"struct","optional":false},"payload":{"before":null,"after":{"id":1,"v":"a"},"op":"c","ts_ms":1,${src(1)}}}""",
      s"""{"before":null,"after":{"id":2,"v":"b"},"op":"c","ts_ms":2,${src(2)}}""",
      s"""{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"A"},"op":"u","ts_ms":3,${src(3)}}""",
      s"""{"before":{"id":2,"v":"b"},"after":null,"op":"d","ts_ms":4,${src(4)}}""")
    Files.write(dir.resolve("capture-000.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val yaml = writeYaml(
      s"""source:
         |  type: debezium-file
         |  path: $dir
         |  table: filedb.items
         |  schema: "id BIGINT, v STRING"
         |  primary-key: id
         |sink:
         |  type: values
         |pipeline:
         |  name: cli-dbz-e2e
         |""".stripMargin)
    val (code, out) = collectOut(Array(yaml))
    assert(code == 0, out.mkString("\n"))
    assert(out.exists(_.contains("filedb.items: 1 rows")), out.mkString("\n"))
  }

  test("curation yaml: dry-run prints steps, full run writes curated parquet") {
    import spark.implicits._
    val in = Files.createTempDirectory("cli_curate_in").toString
    val out = Files.createTempDirectory("cli_curate_out").toString
    ((0L until 10L).map(i => (i, s"doc number $i with its own words here")) :+
      (100L, "doc number 3 with its own words here")) // exact copy of doc 3
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val yaml = writeYaml(
      s"""curation:
         |  input: $in
         |  output: $out
         |  steps:
         |    - type: exact-dedup
         |    - type: pii-redact
         |""".stripMargin)
    val (dryCode, dryOut) = collectOut(Array(yaml, "--dry-run"))
    assert(dryCode == 0)
    assert(dryOut.exists(_.contains("step 1: exact-dedup")))
    assert(dryOut.exists(_.contains("dry run")))

    val (code, outLines) = collectOut(Array(yaml, "--master", "local[2]"))
    assert(code == 0, outLines.mkString("\n"))
    assert(outLines.exists(_.matches(".*input: 11 rows.*")))
    assert(outLines.exists(_.matches(".*exact-dedup: 10 rows.*")))
    assert(spark.read.parquet(out).count() == 10)
  }

  test("full run: yaml through the scripted source to the values sink") {
    spark // ensure the shared test session exists before getOrCreate
    val t = TableId.parse("clidb.items")
    val schema = TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("id"))
    val src = new ScriptedChangeSource(t, schema,
      (1L to 4L).map(i => Map[String, Any]("id" -> i, "v" -> s"v$i")))
    src.append(DataChangeEvent.delete(t, Map("id" -> 4L, "v" -> "v4")))
    ChangeSourceRegistry.register("cli-src", src)
    try {
      val yaml = writeYaml(
        """source:
          |  type: cdc
          |  sourceId: cli-src
          |sink:
          |  type: values
          |pipeline:
          |  name: cli-e2e
          |  parallelism: 4
          |""".stripMargin)
      val (code, out) = collectOut(Array(yaml))
      assert(code == 0, out.mkString("\n"))
      assert(out.exists(_.contains("clidb.items: 3 rows")), out.mkString("\n"))
      assert(out.exists(_.contains("finished")))
    } finally ChangeSourceRegistry.remove("cli-src")
  }
}
