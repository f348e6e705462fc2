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
    val pairs = exprs.map { e =>
      aliasOf.findFirstMatchIn(e) match {
        case Some(m) => m.group(1) -> e.substring(0, m.start)
        // a bare backquoted identifier names its output WITHOUT the ticks
        case None => TransformOp.outputName(e) -> e
      }
    }
    // Shading: a later projection column with the SAME output name REPLACES
    // the earlier one AT THE EARLIER POSITION (generateProjectionColumns,
    // TransformParser.java:370-380) — `*, 0.5 + CAST(col1 AS DOUBLE) AS col1`
    // redefines col1 in place instead of emitting a duplicate struct field.
    val firstIdx = scala.collection.mutable.HashMap.empty[String, Int]
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    pairs.foreach { case p @ (name, _) =>
      firstIdx.get(name) match {
        case Some(i) => kept(i) = p
        case None => firstIdx(name) = kept.size; kept += p
      }
    }
    kept.toSeq
  }

  /** Parse a dialect expression with the reference's type-strict equality
    * ([[graft.functions.StrictEquality]]) — operand types resolved against
    * the payload schema; unknown names (metadata/computed columns) are left
    * to Spark's native semantics.
    */
  private def dExpr(
      df: DataFrame, sql: String, payload: StructType): Column =
    graft.functions.StrictEquality.parse(df.sparkSession, sql,
      n => payload.fields.find(_.name == n).map(_.dataType),
      timeTagged = n => payload.fields.find(_.name == n).exists(
        _.metadata.contains(graft.functions.DialectCastExpr.TimeTypeKey)))

  /** The filter evaluates on the POST-projection frame, so its operand types
    * must resolve against the EFFECTIVE projection: a shading redefinition
    * like `*, CAST(col1 AS INT) AS col1` (col1 BIGINT) changes col1's boxed
    * class, and `col1 = 3` must compare the SHADED Integer like the
    * reference does (filter runs on the projected row,
    * `PostTransformOperator.java:285-345`) — folding from the raw payload
    * type would silently drop matching rows. Names a projection redefines
    * resolve to the redefining expression's INFERRED type; uninferable
    * redefinitions resolve to None (left to Spark, never folded stale).
    */
  private def filterExpr(
      df: DataFrame, sql: String, rule: TransformRule, payload: StructType): Column = {
    val spark = df.sparkSession
    val base: String => Option[org.apache.spark.sql.types.DataType] =
      n => payload.fields.find(_.name == n).map(_.dataType)
    val redefined: Map[String, Option[org.apache.spark.sql.types.DataType]] =
      projectionExprs(rule, payload.fieldNames.toSeq)
        .filter { case (n, e) => n != e }
        .map { case (n, e) =>
          n -> graft.functions.StrictEquality.inferType(spark, e, base)
        }.toMap
    graft.functions.StrictEquality.parse(spark, sql,
      n => redefined.getOrElse(n, base(n)),
      timeTagged = n => !redefined.contains(n) &&
        payload.fields.find(_.name == n).exists(
          _.metadata.contains(graft.functions.DialectCastExpr.TimeTypeKey)))
  }

  /** `isAfter` picks the RowKind token side — the reference computes
    * `__data_event_type__` PER IMAGE (`PostTransformOperator.java:285-311`:
    * beforeOp for the before projection, afterOp for the after), so an
    * UPDATE's before-image reads `-U` and its after-image `+U`.
    */
  private def withMeta(df: DataFrame, tableId: TableId, isAfter: Boolean): DataFrame = df
    .withColumn(Envelope.NamespaceName, lit(tableId.namespace))
    .withColumn(Envelope.SchemaName, lit(tableId.schemaName))
    .withColumn(Envelope.TableName, lit(tableId.tableName))
    .withColumn(Envelope.DataEventType,
      Envelope.opTypeToken(col(Envelope.OpCol), isAfter))
    .withColumn(graft.functions.Dialect.EpochCol, epochMillis(df))

  /** The per-record processing epoch the now-family binds to — the
    * reference's `__epoch_time__` (JaninoCompiler.java:83-84 stamps
    * System.currentTimeMillis per record). Here it is per BATCH
    * (current_timestamp is micro-batch-consistent); a pinned
    * `spark.graft.epoch.millis` makes conformance gates deterministic.
    * Unused projections prune the column away.
    */
  private def epochMillis(df: DataFrame): Column =
    df.sparkSession.conf.getOption("spark.graft.epoch.millis") match {
      case Some(v) => lit(v.toLong)
      case None => unix_millis(current_timestamp())
    }

  /** The DELETE-aware image with payload columns flattened to bare names and
    * the rule's computed columns in scope — the frame both the filter and the
    * acceptance predicate evaluate against. `keep` columns pass through. */
  private def filterFrame(
      env: DataFrame, rule: TransformRule, tableId: TableId,
      payload: StructType, keep: Seq[String]): DataFrame = {
    val payloadFields = payload.fieldNames.toSeq
    val img = when(col(Envelope.OpCol) === "DELETE", col(Envelope.BeforeCol))
      .otherwise(col(Envelope.AfterCol))
    // the filter evaluates on the DELETE-aware image: after for
    // INSERT/UPDATE (+I/+U), before for DELETE (-D) — isAfter tokens
    // already render DELETE as -D
    val flat = withMeta(env.withColumn("__img", img), tableId, isAfter = true)
      .select((keep.map(col) :+ col("__img")) ++
        (Envelope.MetadataColumns :+ graft.functions.Dialect.EpochCol).map(col) ++
        // source-defined metadata columns read the event's meta map, typed
        // per the SupportedMetadataColumn contract (op_ts -> BIGINT)
        TransformOp.metaKeyColumns(rule, payloadFields)
          .map(n => TransformOp.metaKeyColumn(col(Envelope.MetaCol), n)) ++
        payloadFields.map(n => col(s"__img.$n").as(n)): _*)
    // computed columns (incl. SHADED redefinitions of payload names) evaluate
    // against the ORIGINAL flat frame in one select — the filter then sees
    // the post-projection value uniformly (`col1 > 1.5` against the shaded
    // double col1, testShadeOriginalColumnsWithDifferentType:2778)
    val computed = projectionExprs(rule, payloadFields).filter { case (n, e) => n != e }
    flat.select(
      flat.columns.filterNot(c => computed.exists(_._1 == c)).map(col).toSeq ++
        computed.map { case (n, e) => dExpr(flat, e, payload).as(n) }: _*)
  }

  def apply(env: DataFrame, rule: TransformRule, tableId: TableId): DataFrame = {
    graft.functions.DialectCastExpr.ensureRegistered(env.sparkSession)
    val payload = env.schema(Envelope.AfterCol).dataType.asInstanceOf[StructType]
    val payloadFields = payload.fieldNames.toSeq
    require(
      payloadFields.intersect(EnvCols).isEmpty,
      s"payload columns may not shadow envelope columns: $EnvCols")

    val projExprs = projectionExprs(rule, payloadFields)

    // ---- filter: evaluate on the DELETE-aware image, computed cols visible --
    val filtered = rule.filter match {
      case Some(f) =>
        filterFrame(env, rule, tableId, payload, EnvCols)
          .filter(filterExpr(env, f, rule, payload)).select(EnvCols.map(col): _*)
      case None => env
    }

    // ---- projection: re-project each image through the expressions ----------
    def projectImage(df: DataFrame, imageCol: String): DataFrame = {
      val flat = withMeta(df, tableId, isAfter = imageCol == Envelope.AfterCol)
        .select((df.columns.map(col).toSeq :+ lit(1).as("__one")) ++
          (Envelope.MetadataColumns :+ graft.functions.Dialect.EpochCol).map(col) ++
          TransformOp.metaKeyColumns(rule, payloadFields)
            .map(n => TransformOp.metaKeyColumn(col(Envelope.MetaCol), n)) ++
          payloadFields.map(n => col(s"$imageCol.$n").as(s"__f_$n")): _*)
      // expressions reference bare payload names: alias them in scope
      val scoped = payloadFields.foldLeft(flat)((d, n) => d.withColumn(n, col(s"__f_$n")))
      val packed = scoped.withColumn(
        s"__new_$imageCol",
        when(col(imageCol).isNotNull,
          struct(projExprs.map { case (name, e) =>
            dExpr(df, e, payload).as(name) }.toIndexedSeq: _*)))
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
        graft.functions.DialectCastExpr.ensureRegistered(env.sparkSession)
        val payload = env.schema(Envelope.AfterCol).dataType.asInstanceOf[StructType]
        val accepted: Column =
          coalesce(filterExpr(env, f, rule, payload).cast("boolean"), lit(false))
        filterFrame(env, rule, tableId, payload, env.columns.toSeq)
          .withColumn(outCol, accepted)
          .select((env.columns.toSeq :+ outCol).map(col): _*)
    }
}
