package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{BinaryArithmetic, Cast, Coalesce, EqualTo, Expression, In, Literal, UnaryMinus}
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
      rewrite(spark.sessionState.sqlParser.parseExpression(sql), typeOf, timeTagged,
        session = Some(spark)))

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
      // arithmetic types like Java numeric promotion (the domain the
      // reference's Janino-compiled expressions evaluate in): operands
      // below int promote to int, then the wider primitive wins
      case b: BinaryArithmetic =>
        for {
          l <- typeOfExpr(b.left, typeOf)
          r <- typeOfExpr(b.right, typeOf)
          w <- javaArithType(l, r)
        } yield w
      case UnaryMinus(c, _) =>
        typeOfExpr(c, typeOf).map(t => if (isSubInt(t)) IntegerType else t)
      case _ => None
    }

  private def isSubInt(dt: DataType): Boolean =
    dt == ByteType || dt == ShortType

  /** Java binary-numeric-promotion result type (JLS 5.6.2) — what the
    * reference's generated `$0 * $1` evaluates in. None for non-primitive
    * operand types (DECIMAL goes through DecimalData helpers instead).
    */
  private def javaArithType(l: DataType, r: DataType): Option[DataType] = {
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType | ShortType | IntegerType => Some(0)
      case LongType => Some(1)
      case FloatType => Some(2)
      case DoubleType => Some(3)
      case _ => None
    }
    for { a <- rank(l); b <- rank(r) } yield Seq(IntegerType, LongType, FloatType,
      DoubleType)(math.max(a, b))
  }

  /** The boxed type a projection EXPRESSION would carry at runtime — used to
    * resolve filter operands against the POST-shading frame: a projection
    * `*, CAST(col1 AS INT) AS col1` redefines col1's runtime class, and the
    * filter's `col1 = 3` must fold (or not) against the SHADED type, not the
    * raw payload's (the reference's filter evaluates on the projected row,
    * `PostTransformOperator.java:285-345`). Uninferable expressions return
    * None — the comparison is then left to Spark untouched, never folded
    * from a stale type.
    */
  def inferType(
      spark: SparkSession,
      sql: String,
      typeOf: String => Option[DataType]): Option[DataType] =
    try typeOfExpr(spark.sessionState.sqlParser.parseExpression(sql), typeOf)
    catch { case _: Exception => None }

  private[functions] def rewrite(
      expr: Expression,
      typeOf: String => Option[DataType],
      timeTagged: String => Boolean = _ => false,
      session: Option[SparkSession] = None): Expression = {
    def differentBox(l: Expression, r: Expression): Boolean =
      (for {
        a <- typeOfExpr(l, typeOf).flatMap(boxClass)
        b <- typeOfExpr(r, typeOf).flatMap(boxClass)
      } yield a != b).getOrElse(false)

    // valueEquals is TWO-valued (`SystemFunctionUtils.valueEquals:755`
    // returns plain false when either operand is null, and `<>` compiles to
    // `!valueEquals`, `JaninoCompiler.java:267`), while Spark equality is
    // three-valued. Kept equalities therefore wrap in COALESCE(eq, false):
    // filters behave identically, and a MATERIALIZED boolean projection
    // column reads false (reference) instead of NULL on null operands. The
    // enclosing NOT of `<>` then yields true, matching !valueEquals.
    def twoValued(e: Expression): Expression = Coalesce(Seq(e, Literal(false)))
    // Java numeric promotion (JLS 5.6.2): the reference's Janino-compiled
    // arithmetic never computes in byte/short — `age * age * age` on a
    // TINYINT column multiplies Java ints (testMultipleReferencedColumnsIn
    // Projection:172 cubes a TINYINT 15 to 3375). Spark keeps byte*byte in
    // the narrow type and overflows, so promote known sub-int operands.
    def promoted(e: Expression): Expression =
      if (typeOfExpr(e, typeOf).exists(isSubInt)) Cast(e, IntegerType) else e
    expr.transformUp {
      case b: BinaryArithmetic if b.children.exists(
          c => typeOfExpr(c, typeOf).exists(isSubInt)) =>
        b.withNewChildren(b.children.map(promoted))
      case u @ UnaryMinus(c, _) if typeOfExpr(c, typeOf).exists(isSubInt) =>
        u.withNewChildren(Seq(promoted(c)))
      case eq @ EqualTo(l, r) =>
        if (differentBox(l, r)) Literal(false) else twoValued(eq)
      case in @ In(v, list) if list.nonEmpty =>
        // per-element valueEquals: a list element of a different boxed class
        // can never match; when no element can, the IN is constant false.
        // IN stays three-valued: the reference's `in(null, ...)` NPEs the
        // pipeline (`SystemFunctionUtils.in:361` calls value.equals), so
        // there is no reference BOOLEAN result to reproduce — Spark's NULL
        // is the non-faulting stand-in.
        val kept = list.filterNot(e => differentBox(v, e))
        if (kept.isEmpty) Literal(false)
        else if (kept.size == list.size) in
        else In(v, kept)
      case f: UnresolvedFunction
          if f.nameParts.size == 1 &&
            session.exists(UdfRegistry.isVariadic(_, f.nameParts.head)) =>
        // variadic UDF dispatch: the reference derives arity from the
        // Object... eval signature; Spark's registry is fixed-arity, so the
        // registry registered one wrapper per arity and the call renames to
        // the matching one
        if (f.arguments.size > UdfRegistry.MaxVariadicArity)
          throw new IllegalArgumentException(
            s"variadic UDF '${f.nameParts.head}' called with " +
              s"${f.arguments.size} arguments — too many arguments " +
              s"(max ${UdfRegistry.MaxVariadicArity})")
        f.copy(nameParts =
          Seq(UdfRegistry.variadicArityName(f.nameParts.head, f.arguments.size)))
      case c: Cast if c.dataType == StringType =>
        c.child match {
          case a: UnresolvedAttribute if timeTagged(a.nameParts.last) =>
            TimeToStringExpr(a)
          case _ => c
        }
    }
  }
}
