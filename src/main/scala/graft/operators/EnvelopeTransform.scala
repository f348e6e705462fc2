package graft.operators

import graft.core.TableId
import org.apache.spark.sql.DataFrame
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

  def apply(env: DataFrame, rule: TransformRule, tableId: TableId): DataFrame = {
    val payload = env.schema(Envelope.AfterCol).dataType.asInstanceOf[StructType]
    val payloadFields = payload.fieldNames.toSeq
    require(
      payloadFields.intersect(EnvCols).isEmpty,
      s"payload columns may not shadow envelope columns: $EnvCols")

    val projExprs: Seq[(String, String)] = {
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

    def withMeta(df: DataFrame): DataFrame = df
      .withColumn(Envelope.NamespaceName, lit(tableId.namespace))
      .withColumn(Envelope.SchemaName, lit(tableId.schemaName))
      .withColumn(Envelope.TableName, lit(tableId.tableName))
      .withColumn(Envelope.DataEventType, col(Envelope.OpCol))

    // ---- filter: evaluate on the DELETE-aware image, computed cols visible --
    val filtered = rule.filter match {
      case Some(f) =>
        val img = when(col(Envelope.OpCol) === "DELETE", col(Envelope.BeforeCol))
          .otherwise(col(Envelope.AfterCol))
        val flat = withMeta(env.withColumn("__img", img))
          .select((EnvCols.map(col) :+ col("__img")) ++ Envelope.MetadataColumns.map(col) ++
            payloadFields.map(n => col(s"__img.$n").as(n)): _*)
        val computed = projExprs.foldLeft(flat) { case (d, (name, e)) =>
          if (d.columns.contains(name)) d else d.withColumn(name, expr(e))
        }
        computed.filter(expr(f)).select(EnvCols.map(col): _*)
      case None => env
    }

    // ---- projection: re-project each image through the expressions ----------
    def projectImage(df: DataFrame, imageCol: String): DataFrame = {
      val flat = withMeta(df)
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
}
