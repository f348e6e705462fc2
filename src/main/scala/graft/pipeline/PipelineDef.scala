package graft.pipeline

import graft.operators.{RouteRule, TransformRule}

/** Pipeline IR, mirroring `flink-cdc-composer/.../definition/PipelineDef.java`
  * and friends (SourceDef/SinkDef/RouteDef/TransformDef/UdfDef/ModelDef).
  */
final case class SourceDef(sourceType: String, name: Option[String], config: Map[String, String])

final case class SinkDef(
    sinkType: String,
    name: Option[String],
    config: Map[String, String],
    includeSchemaChanges: Seq[String] = Seq.empty,
    excludeSchemaChanges: Seq[String] = Seq.empty)

final case class UdfDef(name: String, classpath: String)

/** `model:` section — named model functions (`composer/definition/ModelDef.java`). */
final case class ModelDef(name: String, modelName: String, options: Map[String, String])

final case class PipelineDef(
    source: SourceDef,
    sink: SinkDef,
    routes: Seq[RouteRule] = Seq.empty,
    transforms: Seq[TransformRule] = Seq.empty,
    udfs: Seq[UdfDef] = Seq.empty,
    models: Seq[ModelDef] = Seq.empty,
    config: Map[String, String] = Map.empty) {

  def name: String = config.getOrElse("name", "graft-pipeline")
  def parallelism: Int = config.getOrElse("parallelism", "1").toInt
  /** `pipeline.execution.runtime-mode` (`PipelineOptions.java:49-53`,
    * defaulted in `PipelineDef.java:190-194`): STREAMING runs the changelog
    * stream; BATCH is a bounded one-shot materialization of the snapshot.
    */
  def runtimeMode: String = {
    val m = config.getOrElse("execution.runtime-mode", "STREAMING").toUpperCase
    require(m == "STREAMING" || m == "BATCH",
      s"unknown execution.runtime-mode '$m' (STREAMING or BATCH)")
    m
  }
  def schemaChangeBehavior: SchemaChangeBehavior.Value = {
    val raw = config.getOrElse("schema.change.behavior", "LENIENT")
    // refuse at submission with the valid set, like the reference's enum
    // option parse (`SchemaEvolvingTransformE2eITCase.testUnexpectedBehavior`
    // expects the job to never submit under `behavior: unexpected`)
    try SchemaChangeBehavior.withName(raw.toUpperCase)
    catch {
      case _: NoSuchElementException => throw new IllegalArgumentException(
        s"Unexpected schema change behavior: $raw (expected one of " +
          s"${SchemaChangeBehavior.values.mkString(", ")})")
    }
  }
  def localTimeZone: String = config.getOrElse("local-time-zone", "UTC")
}
