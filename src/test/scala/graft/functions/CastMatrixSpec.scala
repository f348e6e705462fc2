package graft.functions

import graft.SparkTestBase
import org.apache.spark.SparkThrowable
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests for the CAST matrix (`transform.md:205-216`; impls
  * `SystemFunctionUtils.castToByte:799` … `castToTimestamp:1031`): the
  * reference throws on out-of-range/unparseable casts, which is Spark's ANSI
  * mode — these properties pin that equivalence for random inputs.
  *
  * ScalaCheck generators drive the sampling directly (the scalatest-plus
  * bridge is not among the offline deps).
  */
class CastMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def forAll[T](gen: Gen[T], samples: Int = 40)(f: T => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(20260812L)
    Iterator.iterate(seed)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }
      .take(samples)
      .foreach(f)
  }

  private def ansi[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try f finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  private def evalLong(expr: String): Long =
    ansi(spark.sql(s"SELECT CAST(($expr) AS BIGINT)").head().getLong(0))

  private def throwsAnsi(expr: String): Boolean =
    ansi {
      try { spark.sql(s"SELECT $expr").head(); false }
      catch { case _: SparkThrowable | _: ArithmeticException => true }
    }

  test("integral widening casts are value-preserving") {
    forAll(Gen.choose(Byte.MinValue.toLong, Byte.MaxValue.toLong)) { v =>
      assert(evalLong(s"CAST(CAST($v AS TINYINT) AS BIGINT)") == v)
    }
    forAll(Gen.choose(Short.MinValue.toLong, Short.MaxValue.toLong)) { v =>
      assert(evalLong(s"CAST(CAST($v AS SMALLINT) AS BIGINT)") == v)
    }
  }

  test("narrowing within range preserves, out of range throws (castToByte/Short/Integer)") {
    forAll(Gen.choose(Byte.MinValue.toInt, Byte.MaxValue.toInt)) { v =>
      assert(evalLong(s"CAST($v AS TINYINT)") == v.toLong)
    }
    forAll(Gen.choose(Byte.MaxValue.toInt + 1, Int.MaxValue)) { v =>
      assert(throwsAnsi(s"CAST($v AS TINYINT)"))
    }
    forAll(Gen.choose(Int.MaxValue.toLong + 1, Long.MaxValue)) { v =>
      assert(throwsAnsi(s"CAST(${v}L AS INT)"))
    }
  }

  test("fractional to integral truncates toward zero in range, throws out of range") {
    forAll(Gen.choose(-1000.0, 1000.0)) { d =>
      assert(evalLong(s"CAST(CAST($d AS DOUBLE) AS BIGINT)") == d.toLong)
    }
    assert(throwsAnsi("CAST(CAST(1.0e19 AS DOUBLE) AS BIGINT)"))
  }

  test("string to integral parses digits, throws on junk (castToInteger string path)") {
    forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { v =>
      assert(evalLong(s"CAST('$v' AS INT)") == v.toLong)
    }
    forAll(Gen.alphaStr.suchThat(s => s.nonEmpty && !s.forall(_.isDigit))) { s =>
      assert(throwsAnsi(s"CAST('${s.replace("'", "")}' AS INT)"))
    }
  }

  test("decimal overflow throws, in-precision round-trips (castToDecimalData)") {
    forAll(Gen.choose(-999L, 999L)) { v =>
      assert(evalLong(s"CAST(CAST(CAST($v AS DECIMAL(5,2)) AS DECIMAL(10,2)) AS BIGINT)") == v)
    }
    assert(throwsAnsi("CAST(12345.67 AS DECIMAL(4,2))"))
  }

  test("boolean and timestamp casts (castToBoolean/castToTimestamp)") {
    val b = ansi(spark.sql("SELECT CAST('true' AS BOOLEAN), CAST('false' AS BOOLEAN)").head())
    assert(b.getBoolean(0) && !b.getBoolean(1))
    assert(throwsAnsi("CAST('not-a-bool' AS BOOLEAN)"))
    val ts = ansi(spark.sql(
      "SELECT CAST(CAST('2024-03-01 12:30:45' AS TIMESTAMP_NTZ) AS STRING)").head().getString(0))
    assert(ts == "2024-03-01 12:30:45")
    assert(throwsAnsi("CAST('2024-99-99' AS TIMESTAMP)"))
  }
}
