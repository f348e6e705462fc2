package graft.sinks

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property law of the Paimon schema-file type mapping: every supported
  * Spark type round-trips through its Paimon SQL type string
  * (`paimonType` → `sparkType`) with nullability preserved — for ALL
  * supported types including nested arrays and arbitrary decimal
  * precisions, not just the spec examples. A one-way mapping bug here
  * silently retypes imported columns, so the law is the cheap insurance. */
class PaimonTypeLawsSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  private val primitiveGen: Gen[DataType] = Gen.oneOf(
    Gen.const(BooleanType), Gen.const(ByteType), Gen.const(ShortType),
    Gen.const(IntegerType), Gen.const(LongType), Gen.const(FloatType),
    Gen.const(DoubleType), Gen.const(StringType), Gen.const(BinaryType),
    Gen.const(DateType), Gen.const(TimestampNTZType), Gen.const(TimestampType),
    for {
      p <- Gen.chooseNum(1, 38); s <- Gen.chooseNum(0, p)
    } yield DecimalType(p, s))

  private val typeGen: Gen[DataType] = Gen.frequency(
    4 -> primitiveGen,
    1 -> (for {
      el <- primitiveGen; n <- Gen.oneOf(true, false)
    } yield ArrayType(el, n)))

  test("paimonType -> sparkType round trips with nullability for all supported types") {
    check(Prop.forAll(typeGen, Gen.oneOf(true, false)) { (dt, nullable) =>
      val rendered = PaimonInterchange.paimonType(dt, nullable)
      val (back, backNullable) = PaimonInterchange.sparkType(rendered)
      back == dt && backNullable == nullable
    })
  }

  test("type strings parse case-insensitively on the NOT NULL suffix") {
    assert(PaimonInterchange.sparkType("BIGINT not null") == (LongType, false))
    assert(PaimonInterchange.sparkType("  STRING  ") == (StringType, true))
  }
}
