package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The pre-validation ↔ driver-gate contract: the driver's hasher
  * canonicalizes DECIMAL output differently from its DuckDB oracle (round 7:
  * `c_lakehouse_agg` was value-exact yet hash-red), so Verify must refuse any
  * comparison-surface schema carrying a decimal — loudly, at dump time —
  * instead of shipping an output the driver will hash differently.
  */
class VerifySpec extends AnyFunSuite {

  test("assertHashSafeSchema rejects decimal output columns, even nested") {
    val bad = StructType(Seq(
      StructField("k", LongType),
      StructField("total", DecimalType(18, 2))))
    val e = intercept[IllegalStateException](Verify.assertHashSafeSchema("q", bad))
    assert(e.getMessage.contains("total") && e.getMessage.contains("decimal"))

    val nestedStruct = StructType(Seq(
      StructField("s", StructType(Seq(StructField("d", DecimalType(10, 0)))))))
    intercept[IllegalStateException](Verify.assertHashSafeSchema("q", nestedStruct))

    val nestedArray = StructType(Seq(
      StructField("a", ArrayType(DecimalType(5, 2)))))
    intercept[IllegalStateException](Verify.assertHashSafeSchema("q", nestedArray))

    val nestedMap = StructType(Seq(
      StructField("m", MapType(StringType, DecimalType(5, 2)))))
    intercept[IllegalStateException](Verify.assertHashSafeSchema("q", nestedMap))
  }

  test("assertHashSafeSchema passes hash-stable types") {
    val ok = StructType(Seq(
      StructField("k", LongType),
      StructField("total", DoubleType),
      StructField("ts", TimestampType),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(StructField("x", IntegerType))))))
    Verify.assertHashSafeSchema("q", ok) // must not throw
  }

  test("every query has an oracle and every oracle has a query") {
    // a queries entry without an oracle degrades to the driver's weaker
    // rows-only check; an orphaned oracle is dead weight hiding a rename —
    // both are silent drift the contract forbids
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }

}
