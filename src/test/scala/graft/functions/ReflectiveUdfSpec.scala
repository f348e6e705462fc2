package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ScalarFunction-shaped UDF acceptance (the reference accepts vanilla
  * Flink `ScalarFunction` subclasses by introspection,
  * `UserDefinedFunctionDescriptor.isCdcPipelineUdf:85-103`) — overload
  * dispatch by runtime class, Java-varargs packing, lifecycle pass-through,
  * loud rejection of eval-less classes.
  */
class ReflectiveUdfSpec extends AnyFunSuite {

  test("overload dispatch by runtime argument class") {
    val f = new ReflectiveUdf("typeof",
      new graft.functions.udfexamples.flinkshaped.TypeOfFunctionClass)
    assert(f.eval(java.lang.Boolean.TRUE) == "Boolean: true")
    assert(f.eval(Integer.valueOf(1)) == "Integer: 1")
    assert(f.eval("str") == "String: str")
    assert(f.eval(new java.math.BigDecimal("3.14")) == "Double: 3.14")
    val e = intercept[IllegalArgumentException](f.eval(Seq(1)))
    assert(e.getMessage.contains("no eval overload"))
  }

  test("two same-count overloads pick the assignable one (addone)") {
    val f = new ReflectiveUdf("addone",
      new graft.functions.udfexamples.flinkshaped.AddOneFunctionClass)
    assert(f.eval(Integer.valueOf(41)) == "42")
    assert(f.eval("41") == "42")
    assert(f.arity == 1)
    assert(!f.variadic)
  }

  test("Java-varargs eval packs the tail and registers variadic") {
    val f = new ReflectiveUdf("format",
      new graft.functions.udfexamples.flinkshaped.FormatFunctionClass)
    assert(f.variadic, "a varargs eval must register every arity")
    assert(f.eval("%s!", "a") == "a!")
    assert(f.eval("from %s to %s is %s", "1", "z", "lie") == "from 1 to z is lie")
  }

  test("a class with no eval is rejected with the reference's wording") {
    val e = intercept[IllegalArgumentException](
      new ReflectiveUdf("bad", new java.lang.Object))
    assert(e.getMessage.contains("eval"))
  }

  test("typed return classes map beyond primitives (BigDecimal, byte[], temporal)") {
    class DecimalReturning extends Serializable {
      def eval(s: String): java.math.BigDecimal = new java.math.BigDecimal(s)
    }
    class BytesReturning extends Serializable {
      def eval(s: String): Array[Byte] = s.getBytes("UTF-8")
    }
    class TsReturning extends Serializable {
      def eval(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
    }
    assert(new ReflectiveUdf("d", new DecimalReturning).returnType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType])
    assert(new ReflectiveUdf("b", new BytesReturning).returnType ==
      org.apache.spark.sql.types.BinaryType)
    assert(new ReflectiveUdf("t", new TsReturning).returnType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("conflicting eval return types fail loudly instead of a coin-flip schema") {
    class Conflicting extends Serializable {
      def eval(i: Integer): Integer = i
      def eval(s: String): java.lang.Double = s.toDouble
    }
    val e = intercept[IllegalArgumentException](
      new ReflectiveUdf("conflict", new Conflicting).returnType)
    assert(e.getMessage.contains("conflicting return types"))
  }
}
