package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The transform dialect's CAST — `SystemFunctionUtils.java:767-1047`. It
  * NEVER throws, where Spark's ANSI CAST (the default since 4.0) raises:
  *
  *  - numeric → integral truncates toward zero (`castToByte:799` routes
  *    Double/Float/Decimal through `.byteValue()`);
  *  - string → integral tries the exact integral parse, then falls back to
  *    a double parse + truncation (`"12.13"` → 12), and yields NULL when
  *    neither parses (`castToByte:818-827`);
  *  - string → boolean is `Boolean.valueOf` — lowercase-insensitive
  *    `"true"` only, everything else (incl. `"1"`, `"yes"`) is false
  *    (`castToBoolean:796`); numeric → boolean is `!= 0`;
  *  - → DECIMAL(p,s) parses the value's string form under
  *    `MathContext(p)` + `setScale(s, HALF_UP)` and yields NULL on parse
  *    failure OR precision overflow (`castToBigDecimal:983-1005`);
  *  - float → double widens numerically (`castToDouble:973` `.doubleValue()`
  *    — the `-6.7f → -6.699999809265137` artifact), but float → DECIMAL goes
  *    through `String.valueOf` (`castObjectIntoString:1049`) so `-6.7f`
  *    stays `-6.7`.
  *
  * Registered as `graft_cast(expr, 'TYPE')`; [[Dialect.translate]] rewrites
  * dialect CASTs of the affected target types to it. CodegenFallback: this
  * sits on the user's transform expressions, not the scan hot path.
  */
case class DialectCastExpr(child: Expression, typeName: String)
    extends UnaryExpression with CodegenFallback {

  override lazy val dataType: DataType = DialectCastExpr.parseType(typeName)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else DialectCastExpr.castValue(v, dataType)
  }

  override protected def withNewChildInternal(newChild: Expression): DialectCastExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_cast"
}

/** `CAST(time_col AS VARCHAR)` for TIME(p) columns — the reference's
  * `castToString(TimeData)` is `LocalTime.toString` at millisecond precision
  * (`TimeData.java:72-74`, pinned by
  * `FlinkPipelineTransformITCase.testDateAndTimeCastingFunctions:2904`:
  * `21:48:25` / `21:48:25.123`). Spark has no TIME type; graft models TIME(p)
  * as INT millis-of-day with a StructField metadata tag (SURVEY §1.3), and
  * [[StrictEquality.parse]] rewrites string-casts of tagged columns to this.
  */
case class TimeToStringExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else UTF8String.fromString(
      java.time.LocalTime.ofNanoOfDay(v.asInstanceOf[Int] * 1000000L).toString)
  }
  override protected def withNewChildInternal(newChild: Expression): TimeToStringExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_time_to_string"
}

/** Type-PRESERVING CEIL/FLOOR (`SystemFunctionUtils.java:594-675`): the
  * reference returns the operand's own type (Double→Double, Float→Float,
  * integrals identity, Decimal→scale-0 Decimal), where Spark's ceil/floor
  * return BIGINT for doubles — pinned by
  * `testBuiltinArithmeticFunctions` (`CEIL(...) AS col7` is DOUBLE 1.0).
  * Registered as `graft_ceil` / `graft_floor`; Dialect.translate rewrites.
  */
case class DialectCeilFloorExpr(child: Expression, isCeil: Boolean)
    extends UnaryExpression with CodegenFallback {
  override lazy val dataType: DataType = child.dataType match {
    case d: DecimalType => DecimalType(d.precision, 0)
    case other => other
  }
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else v match {
      case b: Byte => b
      case s: Short => s
      case i: Int => i
      case l: Long => l
      case f: Float => if (isCeil) math.ceil(f).toFloat else math.floor(f).toFloat
      case d: Double => if (isCeil) math.ceil(d) else math.floor(d)
      case d: Decimal =>
        val mode =
          if (isCeil) java.math.RoundingMode.CEILING else java.math.RoundingMode.FLOOR
        val bd = d.toBigDecimal.bigDecimal.setScale(0, mode)
        Decimal(bd, dataType.asInstanceOf[DecimalType].precision, 0)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): DialectCeilFloorExpr =
    copy(child = newChild)
  override def prettyName: String = if (isCeil) "graft_ceil" else "graft_floor"
}

object DialectCastExpr {

  /** StructField metadata key tagging an INT column as TIME(p) millis-of-day. */
  val TimeTypeKey = "graft.cdc.time.precision"

  private val DecimalRe = "(?i)^(?:DECIMAL|NUMERIC|DEC)\\s*(?:\\(\\s*(\\d+)\\s*(?:,\\s*(\\d+)\\s*)?\\))?$".r

  def parseType(t: String): DataType = t.trim.toUpperCase match {
    case "TINYINT" => ByteType
    case "SMALLINT" => ShortType
    case "INT" | "INTEGER" => IntegerType
    case "BIGINT" => LongType
    case "FLOAT" => FloatType
    case "DOUBLE" => DoubleType
    case "BOOLEAN" => BooleanType
    case other => DecimalRe.findFirstMatchIn(other) match {
      case Some(m) =>
        val p = Option(m.group(1)).map(_.toInt).getOrElse(10)
        val s = Option(m.group(2)).map(_.toInt).getOrElse(0)
        DecimalType(p, s)
      case None =>
        throw new IllegalArgumentException(s"graft_cast: unsupported target type '$t'")
    }
  }

  /** `castToString` / `castObjectIntoString` string forms of internal values. */
  private def stringRep(v: Any): String = v match {
    case u: UTF8String => u.toString
    case d: Decimal => d.toBigDecimal.bigDecimal.toPlainString
    case other => String.valueOf(other)
  }

  private def objString(v: Any): String = v match {
    case b: Boolean => if (b) "1" else "0" // castObjectIntoString:1049
    case other => stringRep(other)
  }

  def castValue(v: Any, target: DataType): Any = target match {
    case BooleanType => v match {
      case b: Boolean => b
      case b: Byte => b != 0
      case s: Short => s != 0
      case i: Int => i != 0
      case l: Long => l != 0L
      case f: Float => f != 0f
      case d: Double => d != 0d
      case d: Decimal => d.toBigDecimal.signum != 0
      case other => stringRep(other).equalsIgnoreCase("true") // Boolean.valueOf
    }
    case ByteType => integral(v, 1)
    case ShortType => integral(v, 2)
    case IntegerType => integral(v, 4)
    case LongType => integral(v, 8)
    case FloatType => v match {
      case b: Boolean => if (b) 1f else 0f
      case d: Decimal => d.toBigDecimal.floatValue
      case d: Double => d.toFloat
      case f: Float => f
      case other =>
        try objString(other).toFloat catch { case _: NumberFormatException => null }
    }
    case DoubleType => v match {
      case b: Boolean => if (b) 1d else 0d
      case d: Decimal => d.toBigDecimal.doubleValue
      case d: Double => d
      case f: Float => f.toDouble // numeric widening, NOT via string
      case other =>
        try objString(other).toDouble catch { case _: NumberFormatException => null }
    }
    case dt: DecimalType =>
      try {
        var bd = new java.math.BigDecimal(
          objString(v), new java.math.MathContext(dt.precision))
        bd = bd.setScale(dt.scale, java.math.RoundingMode.HALF_UP)
        if (bd.precision > dt.precision) null else Decimal(bd, dt.precision, dt.scale)
      } catch { case _: NumberFormatException => null }
    case other =>
      throw new IllegalStateException(s"graft_cast: unreachable target $other")
  }

  /** Integral targets: Boolean → 0/1, fractional numerics truncate toward
    * zero, everything else (integrals included) through the string path —
    * exact width parse first, then double parse + truncate, else NULL.
    */
  private def integral(v: Any, width: Int): Any = {
    def narrow(l: Long): Any = width match {
      case 1 => l.toByte
      case 2 => l.toShort
      case 4 => l.toInt
      case _ => l
    }
    def narrowD(d: Double): Any = width match {
      case 1 => d.toByte
      case 2 => d.toShort
      case 4 => d.toInt
      case _ => d.toLong
    }
    v match {
      case b: Boolean => narrow(if (b) 1L else 0L)
      case d: Decimal =>
        // BigDecimal.byteValue()/shortValue()/intValue()/longValue(): truncate
        // toward zero, wrap on overflow (castToByte:806 etc.)
        val bd = d.toBigDecimal.bigDecimal
        width match {
          case 1 => bd.byteValue
          case 2 => bd.shortValue
          case 4 => bd.intValue
          case _ => bd.longValue
        }
      case d: Double => narrowD(d)
      case f: Float => narrowD(f.toDouble)
      case other =>
        val s = stringRep(other)
        val exact: Option[Any] =
          try Some(width match {
            case 1 => s.toByte
            case 2 => s.toShort
            case 4 => s.toInt
            case _ => s.toLong
          }) catch { case _: NumberFormatException => None }
        exact.getOrElse {
          try narrowD(s.toDouble)
          catch { case _: NumberFormatException => null }
        }
    }
  }

  /** Register the dialect functions in the session (idempotent). Called on
    * every transform application — the exists-probe keeps the per-batch cost
    * to one registry lookup instead of three registry mutations.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cast"))) return
    reg.createOrReplaceTempFunction(
      "graft_cast",
      { exprs =>
        require(exprs.size == 2, "graft_cast(expr, 'TYPE') takes exactly two arguments")
        exprs(1) match {
          case Literal(s: UTF8String, StringType) => DialectCastExpr(exprs.head, s.toString)
          case other => throw new IllegalArgumentException(
            s"graft_cast: second argument must be a string literal type name, got $other")
        }
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_ceil",
      exprs => DialectCeilFloorExpr(exprs.head, isCeil = true), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_floor",
      exprs => DialectCeilFloorExpr(exprs.head, isCeil = false), "built-in")
  }
}
