package graft.functions.udfexamples

import graft.functions.UserDefinedFunction

/** Behavior-equivalent re-implementations of the reference's UDF example
  * classes (`flink-cdc-pipeline-udf-examples/src/main/java/org/apache/flink/
  * cdc/udf/examples/java/` — FormatFunctionClass.java, AddOneFunctionClass
  * .java, TypeOfFunctionClass.java) — the classes its UDF ITCases load by
  * classpath. The YAML `user-defined-function` section resolves these
  * reflectively ([[graft.pipeline.PipelineRunner]]), exactly like the
  * reference's `UserDefinedFunctionDescriptor` does for the originals.
  */

/** `FormatFunctionClass.eval(String format, Object... args)` =
  * `String.format`. The reference derives variadic arity from the signature;
  * this registry is fixed-arity — 4 covers the ITCase call shape
  * (`format('from %s to %s is %s', col1, 'z', 'lie')`).
  */
class FormatFunctionClass extends UserDefinedFunction {
  override def name: String = "format"
  override def arity: Int = 4
  override def eval(args: Any*): Any =
    String.format(
      String.valueOf(args.head),
      args.tail.map(_.asInstanceOf[AnyRef]): _*)
}

/** `AddOneFunctionClass.eval(Integer|String num)` = `num + 1` as STRING. */
class AddOneFunctionClass extends UserDefinedFunction {
  override def name: String = "addone"
  override def arity: Int = 1
  override def eval(args: Any*): Any = args.head match {
    case null => null
    case i: Int => String.valueOf(i + 1)
    case s => String.valueOf(s.toString.trim.toInt + 1)
  }
}

/** `TypeOfFunctionClass.eval(...)` — renders the argument's SQL type. */
class TypeOfFunctionClass extends UserDefinedFunction {
  override def name: String = "typeof"
  override def arity: Int = 1
  override def eval(args: Any*): Any = args.head match {
    case null => "NULL"
    case _: Boolean => "BOOLEAN"
    case _: Byte => "TINYINT"
    case _: Short => "SMALLINT"
    case _: Int => "INT"
    case _: Long => "BIGINT"
    case _: Float => "FLOAT"
    case _: Double => "DOUBLE"
    case _: java.math.BigDecimal => "DECIMAL"
    case _: String => "STRING"
    case other => other.getClass.getSimpleName.toUpperCase
  }
}
