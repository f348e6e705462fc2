package graft.pipeline

import graft.operators.{RouteRule, TransformRule}
import org.yaml.snakeyaml.Yaml

import scala.jdk.CollectionConverters._

/** YAML pipeline definition → [[PipelineDef]], mirroring
  * `flink-cdc-cli/.../parser/YamlPipelineDefinitionParser.java:56-180`
  * (section keys, required fields, defaults). Uses SnakeYAML (ships with
  * Spark's jars) instead of Jackson.
  */
object YamlPipelineParser {

  private def asMap(v: Any): Map[String, Any] = v match {
    case null => Map.empty
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, value) => String.valueOf(k) -> value }.toMap
    case other => throw new IllegalArgumentException(s"expected a YAML mapping, got $other")
  }

  private def asList(v: Any): Seq[Map[String, Any]] = v match {
    case null => Seq.empty
    case l: java.util.List[_] => l.asScala.toSeq.map(asMap)
    case other => throw new IllegalArgumentException(s"expected a YAML list, got $other")
  }

  private def str(m: Map[String, Any], key: String): Option[String] =
    m.get(key).filter(_ != null).map(String.valueOf)

  private def requireStr(m: Map[String, Any], key: String, section: String): String =
    str(m, key).getOrElse(
      throw new IllegalArgumentException(s"Missing required field '$key' in $section"))

  private def stringConfig(m: Map[String, Any], exclude: Set[String]): Map[String, String] =
    m.collect { case (k, v) if !exclude.contains(k) && v != null => k -> String.valueOf(v) }

  /** Comma-separated list field (used by primary-keys / partition-keys /
    * include/exclude schema changes).
    */
  private def csv(s: Option[String]): Seq[String] =
    s.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)

  def parse(yaml: String): PipelineDef = {
    val root = asMap(new Yaml().load[Any](yaml))

    val sourceMap = asMap(root.getOrElse("source",
      throw new IllegalArgumentException("Missing required section 'source'")))
    val source = SourceDef(
      requireStr(sourceMap, "type", "source"),
      str(sourceMap, "name"),
      stringConfig(sourceMap, Set("type", "name")))

    val sinkMap = asMap(root.getOrElse("sink",
      throw new IllegalArgumentException("Missing required section 'sink'")))
    val sink = SinkDef(
      requireStr(sinkMap, "type", "sink"),
      str(sinkMap, "name"),
      stringConfig(sinkMap, Set("type", "name", "include.schema.changes",
        "exclude.schema.changes")),
      csv(str(sinkMap, "include.schema.changes")),
      csv(str(sinkMap, "exclude.schema.changes")))

    val routes = asList(root.getOrElse("route", null)).map { r =>
      RouteRule(
        requireStr(r, "source-table", "route"),
        requireStr(r, "sink-table", "route"),
        str(r, "replace-symbol"),
        str(r, "description"))
    }

    // pipeline config is needed BEFORE the transforms parse: the now-family
    // binds to the per-record epoch in the PIPELINE time zone
    // (`PIPELINE_LOCAL_TIME_ZONE`, `SystemFunctionUtils.localtimestamp:65`)
    val tz = str(asMap(root.getOrElse("pipeline", null)), "local-time-zone")
      .getOrElse("UTC")
    // validate at parse time with the reference's exact wording
    // (`YamlPipelineDefinitionParser` local-time-zone check,
    // `YamlPipelineDefinitionParserTest.testInvalidTimeZone:162`)
    try java.time.ZoneId.of(tz)
    catch {
      case _: java.time.DateTimeException => throw new IllegalArgumentException(
        "Invalid time zone. The valid value should be a Time Zone Database ID" +
          " such as 'America/Los_Angeles' to include daylight saving time. " +
          "Fixed offsets are supported using 'GMT-08:00' or 'GMT+08:00'. " +
          "Or use 'UTC' without time zone and daylight saving time.")
    }
    def dialect(sql: String): String =
      graft.functions.Dialect.translate(
        sql, epochTimeColumn = Some(graft.functions.Dialect.EpochCol), timeZone = tz)

    val transforms = asList(root.getOrElse("transform", null)).map { t =>
      TransformRule(
        requireStr(t, "source-table", "transform"),
        // YAML expressions are in the REFERENCE's dialect (LIKE-as-regex,
        // never-throwing CAST, bare VARCHAR, ...) — translate to Spark SQL
        // here, at the same boundary where the reference's TransformParser
        // consumes them
        // a BLANK projection is the same as no projection — the reference
        // treats null, "" and "*" as equivalent identity projections
        // (`FlinkPipelineTransformITCase.testMultiTransformWithNullEmptyAsteriskProjections:470`)
        str(t, "projection").filter(_.trim.nonEmpty).map(dialect),
        str(t, "filter").filter(_.trim.nonEmpty).map(dialect),
        csv(str(t, "primary-keys")),
        csv(str(t, "partition-keys")),
        str(t, "table-options")
          .map(_.split(",").map(_.trim).filter(_.contains("="))
            .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
          .getOrElse(Map.empty),
        str(t, "converter-after-transform"))
    }

    val udfs = asList(asMap(root.getOrElse("pipeline", null)).getOrElse("user-defined-function",
      root.getOrElse("user-defined-function", null))).map { u =>
      UdfDef(requireStr(u, "name", "udf"), requireStr(u, "classpath", "udf"))
    }

    val models = asList(root.getOrElse("model", null)).map { m =>
      ModelDef(
        requireStr(m, "model-name", "model"),
        str(m, "class-name").getOrElse(requireStr(m, "model-name", "model")),
        stringConfig(m, Set("model-name", "class-name")))
    }

    val config = stringConfig(asMap(root.getOrElse("pipeline", null)),
      Set("user-defined-function"))

    PipelineDef(source, sink, routes, transforms, udfs, models, config)
  }
}
