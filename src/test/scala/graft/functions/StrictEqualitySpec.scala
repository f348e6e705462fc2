package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The dialect's Java-object-equality `=` / `<>` / `IN`
  * (`SystemFunctionUtils.valueEquals:754`): cross-boxed-class numeric
  * equality folds to its constant result at parse time; same-class and
  * unknown-type comparisons keep Spark semantics.
  */
class StrictEqualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val types = Map[String, DataType](
    "big" -> LongType, "i" -> IntegerType, "b" -> ByteType,
    "f" -> FloatType, "d" -> DoubleType, "dec" -> DecimalType(10, 2),
    "s" -> StringType)
  private def lookup(n: String): Option[DataType] = types.get(n)

  private def rendered(sql: String): String =
    StrictEquality.rewrite(
      spark.sessionState.sqlParser.parseExpression(sql), lookup).sql

  test("cross-boxed-class equality folds to false; <> to true via Not") {
    assert(rendered("big = 3") == "false") // Long vs Integer literal
    assert(rendered("big <> 3") == "(NOT false)")
    assert(rendered("b = 15") == "false") // Byte vs Integer literal
    assert(rendered("f = 1.5") == "false") // Float vs Janino double literal
  }

  test("same-class and unknown-type comparisons keep native semantics") {
    assert(rendered("i = 3") != "false") // Integer vs Integer literal
    assert(rendered("d = 1.5") != "false") // Double vs Janino double literal
    assert(rendered("unknown_col = 3") != "false") // unresolvable side: skip
    assert(rendered("s = 'x'") != "false") // strings untouched
    assert(rendered("big > 3") != "false") // inequalities compare numerically
  }

  test("typed operands restore value semantics (CAST / graft_cast)") {
    // the dialect CAST rewrite makes the literal a Long — same box as the
    // column, so the comparison stays live (c_cli_pipeline's filter)
    assert(rendered(Dialect.translate("big <> CAST(2 AS BIGINT)")) != "true")
    assert(rendered(Dialect.translate("CAST(big AS INT) = 3")) != "false")
  }

  test("IN drops cross-class elements; all-dropped folds to false") {
    assert(rendered("big IN (1, 3, 5)") == "false")
    assert(rendered(Dialect.translate("CAST(big AS INT) IN (1, 3, 5)")) != "false")
  }

  test("end-to-end: BIGINT id <> 3 is TRUE for id = 3 (ITCase :705)") {
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      java.util.List.of(Row(3L), Row(4L)),
      StructType(Seq(StructField("big", LongType))))
    val out = df.filter(StrictEquality.parse(spark, "big <> 3",
      n => if (n == "big") Some(LongType) else None)).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }
}
