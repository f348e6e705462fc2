package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `=` / `<>` / `IN` are JAVA OBJECT EQUALITY —
  * `SystemFunctionUtils.valueEquals:754` is `object1.equals(object2)`, so
  * operands of DIFFERENT boxed numeric classes are NEVER equal
  * (`Long(3) != Integer(3)`), while `<` / `>` / `BETWEEN` go through
  * `universalCompares:1057` which compares cross-type numerics as doubles.
  * `FlinkPipelineTransformITCase.testBuiltinComparisonFunctions:705` pins
  * this: `id <> 3` is TRUE for BIGINT id = 3, and the fixture has to spell
  * `CAST(id AS INT) IN (1, 3, 5)` to get value semantics.
  *
  * Spark coerces numeric widths before comparing, so the dialect reproduces
  * the reference by rewriting, on the UNRESOLVED tree (operand types
  * resolved against the known payload schema), any equality whose two sides
  * are provably different boxed numeric classes to its constant result.
  * Only comparisons with BOTH sides' types known are touched; fractional
  * literals count as Janino doubles (the reference compiles `1.5` to a
  * Java double, while Spark's parser types it DECIMAL(2,1)).
  */
object StrictEquality {

  /** Parse `sql` and apply the dialect rewrites; `typeOf` resolves a bare
    * column name to its payload type (None = unknown, left untouched), and
    * `timeTagged` marks TIME(p)-modelled INT columns (millis-of-day) whose
    * string-casts render as `LocalTime.toString` ([[TimeToStringExpr]]).
    */
  def parse(
      spark: SparkSession,
      sql: String,
      typeOf: String => Option[DataType],
      timeTagged: String => Boolean = _ => false): Column =
    ColumnBridge.column(
      rewrite(spark.sessionState.sqlParser.parseExpression(sql), typeOf, timeTagged))

  /** The Java boxed class a value of this Spark type carries in the
    * reference's runtime — the unit `Object.equals` discriminates on.
    */
  private def boxClass(dt: DataType): Option[String] = dt match {
    case ByteType => Some("Byte")
    case ShortType => Some("Short")
    case IntegerType => Some("Integer")
    case LongType => Some("Long")
    case FloatType => Some("Float")
    case DoubleType => Some("Double")
    case _: DecimalType => Some("DecimalData")
    case _ => None
  }

  private def typeOfExpr(e: Expression, typeOf: String => Option[DataType]): Option[DataType] =
    e match {
      case a: UnresolvedAttribute => typeOf(a.nameParts.last)
      // Janino types fractional literals as double; Spark's parser makes
      // them DECIMAL(p,s) — map back so `x = 1.5` on a DOUBLE column keeps
      // value semantics like the reference
      case Literal(_, _: DecimalType) => Some(DoubleType)
      case l: Literal => Some(l.dataType)
      case c: Cast => Some(c.dataType)
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("graft_cast") &&
            f.arguments.size == 2 =>
        f.arguments(1) match {
          case Literal(s: UTF8String, StringType) =>
            Some(DialectCastExpr.parseType(s.toString))
          case _ => None
        }
      case _ => None
    }

  private[functions] def rewrite(
      expr: Expression,
      typeOf: String => Option[DataType],
      timeTagged: String => Boolean = _ => false): Expression = {
    def differentBox(l: Expression, r: Expression): Boolean =
      (for {
        a <- typeOfExpr(l, typeOf).flatMap(boxClass)
        b <- typeOfExpr(r, typeOf).flatMap(boxClass)
      } yield a != b).getOrElse(false)

    expr.transformUp {
      case eq @ EqualTo(l, r) =>
        if (differentBox(l, r)) Literal(false) else eq
      case in @ In(v, list) if list.nonEmpty =>
        // per-element valueEquals: a list element of a different boxed class
        // can never match; when no element can, the IN is constant false
        val kept = list.filterNot(e => differentBox(v, e))
        if (kept.isEmpty) Literal(false)
        else if (kept.size == list.size) in
        else In(v, kept)
      case c: Cast if c.dataType == StringType =>
        c.child match {
          case a: UnresolvedAttribute if timeTagged(a.nameParts.last) =>
            TimeToStringExpr(a)
          case _ => c
        }
    }
  }
}
