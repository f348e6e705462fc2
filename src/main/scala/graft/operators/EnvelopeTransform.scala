package graft.operators

import graft.core.TableId
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Applies a [[TransformRule]] to an envelope DataFrame: the filter drops whole
  * events based on the relevant image (before for DELETE, after otherwise), and
  * the projection is applied to BOTH images — exactly
  * `PostTransformOperator.java:275-397` (`projectBefore:160` / `projectAfter:174`
  * on `DataChangeEvent`).
  *
  * Implementation is pure Catalyst: each image is flattened to top-level
  * columns (so projection/filter SQL references bare names), computed, and
  * re-packed with a null-guard — no per-row code, full codegen.
  */
object EnvelopeTransform {

  private val EnvCols =
    Seq(Envelope.TableIdCol, Envelope.OpCol, Envelope.BeforeCol, Envelope.AfterCol,
      Envelope.SeqCol, Envelope.MetaCol)

  /** (output name, expression) pairs of the rule's projection over the
    * payload columns (wildcard expanded; no projection = identity). */
  private def projectionExprs(
      rule: TransformRule, payloadFields: Seq[String]): Seq[(String, String)] = {
    val exprs = rule.projection match {
      case Some(p) => TransformOp.expandProjection(p, payloadFields)
      case None => payloadFields
    }
    val aliasOf = "(?i)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
    exprs.map { e =>
      aliasOf.findFirstMatchIn(e) match {
        case Some(m) => m.group(1) -> e.substring(0, m.start)
        case None => e -> e
      }
    }
  }

  private def withMeta(df: DataFrame, tableId: TableId): DataFrame = df
    .withColumn(Envelope.NamespaceName, lit(tableId.namespace))
    .withColumn(Envelope.SchemaName, lit(tableId.schemaName))
    .withColumn(Envelope.TableName, lit(tableId.tableName))
    .withColumn(Envelope.DataEventType, col(Envelope.OpCol))

  /** The DELETE-aware image with payload columns flattened to bare names and
    * the rule's computed columns in scope — the frame both the filter and the
    * acceptance predicate evaluate against. `keep` columns pass through. */
  private def filterFrame(
      env: DataFrame, rule: TransformRule, tableId: TableId,
      payloadFields: Seq[String], keep: Seq[String]): DataFrame = {
    val img = when(col(Envelope.OpCol) === "DELETE", col(Envelope.BeforeCol))
      .otherwise(col(Envelope.AfterCol))
    val flat = withMeta(env.withColumn("__img", img), tableId)
      .select((keep.map(col) :+ col("__img")) ++ Envelope.MetadataColumns.map(col) ++
        payloadFields.map(n => col(s"__img.$n").as(n)): _*)
    projectionExprs(rule, payloadFields).foldLeft(flat) { case (d, (name, e)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, expr(e))
    }
  }

  def apply(env: DataFrame, rule: TransformRule, tableId: TableId): DataFrame = {
    val payload = env.schema(Envelope.AfterCol).dataType.asInstanceOf[StructType]
    val payloadFields = payload.fieldNames.toSeq
    require(
      payloadFields.intersect(EnvCols).isEmpty,
      s"payload columns may not shadow envelope columns: $EnvCols")

    val projExprs = projectionExprs(rule, payloadFields)

    // ---- filter: evaluate on the DELETE-aware image, computed cols visible --
    val filtered = rule.filter match {
      case Some(f) =>
        filterFrame(env, rule, tableId, payloadFields, EnvCols)
          .filter(expr(f)).select(EnvCols.map(col): _*)
      case None => env
    }

    // ---- projection: re-project each image through the expressions ----------
    def projectImage(df: DataFrame, imageCol: String): DataFrame = {
      val flat = withMeta(df, tableId)
        .select((df.columns.map(col).toSeq :+ lit(1).as("__one")) ++
          Envelope.MetadataColumns.map(col) ++
          payloadFields.map(n => col(s"$imageCol.$n").as(s"__f_$n")): _*)
      // expressions reference bare payload names: alias them in scope
      val scoped = payloadFields.foldLeft(flat)((d, n) => d.withColumn(n, col(s"__f_$n")))
      val packed = scoped.withColumn(
        s"__new_$imageCol",
        when(col(imageCol).isNotNull,
          struct(projExprs.map { case (name, e) => expr(e).as(name) }.toIndexedSeq: _*)))
      packed.select(df.columns.map {
        case c if c == imageCol => col(s"__new_$imageCol").as(imageCol)
        case c => col(c)
      }.toIndexedSeq: _*)
    }

    val projected = projectImage(projectImage(filtered, Envelope.AfterCol), Envelope.BeforeCol)
    projected.select(EnvCols.map(col): _*)
  }

  /** Per-row boolean acceptance of `rule`'s filter, appended as `outCol`
    * with every existing column preserved — the dispatch primitive when
    * MULTIPLE transform rules match one table: the reference hands each
    * record to the FIRST transformer whose filter passes
    * (`PostTransformOperator.java:288-345` loops transformers and returns
    * on the first `filterPassed`). A rule without a filter accepts every
    * row; a NULL filter result rejects (SQL filter semantics).
    */
  def acceptance(
      env: DataFrame, rule: TransformRule, tableId: TableId, outCol: String): DataFrame =
    rule.filter match {
      case None => env.withColumn(outCol, lit(true))
      case Some(f) =>
        val payload = env.schema(Envelope.AfterCol).dataType.asInstanceOf[StructType]
        val payloadFields = payload.fieldNames.toSeq
        val accepted: Column = coalesce(expr(f).cast("boolean"), lit(false))
        filterFrame(env, rule, tableId, payloadFields, env.columns.toSeq)
          .withColumn(outCol, accepted)
          .select((env.columns.toSeq :+ outCol).map(col): _*)
    }
}
