package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The transform-dialect rewrites (`TransformSqlOperatorTable` →
  * Spark SQL): LIKE-as-regex, epoch-time binding, alias spellings.
  */
class DialectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("LIKE and NOT LIKE rewrite to RLIKE outside string literals") {
    assert(Dialect.translate("name LIKE 'a.c'") == "name RLIKE 'a.c'")
    assert(Dialect.translate("name NOT LIKE 'x'") == "name NOT RLIKE 'x'")
    // already-RLIKE stays; LIKE inside a literal is untouched
    assert(Dialect.translate("name RLIKE 'a'") == "name RLIKE 'a'")
    assert(Dialect.translate("v = 'I LIKE cats' AND name LIKE 'a'") ==
      "v = 'I LIKE cats' AND name RLIKE 'a'")
    // escaped quotes inside literals keep literal tracking intact
    assert(Dialect.translate("v = 'it''s LIKE this' AND a LIKE 'b'") ==
      "v = 'it''s LIKE this' AND a RLIKE 'b'")
  }

  test("LIKE ... ESCAPE folds the escape into the regex pattern") {
    // escaped regex metachar becomes a literal: '!.' with ESCAPE '!' -> \.
    assert(Dialect.translate("name LIKE 'a!.c' ESCAPE '!'") == "name RLIKE 'a\\\\.c'")
    // escaped non-metachar passes through plain
    assert(Dialect.translate("name LIKE 'a!bc' ESCAPE '!'") == "name RLIKE 'abc'")
    assert(Dialect.translate("name NOT LIKE 'x!+y' ESCAPE '!'") == "name NOT RLIKE 'x\\\\+y'")
    // end-to-end: the folded pattern must match literally, not as regex
    val sql = Dialect.translate(
      "SELECT 'a.c' LIKE 'a!.c' ESCAPE '!' AS hit, 'axc' LIKE 'a!.c' ESCAPE '!' AS miss")
    val row = spark.sql(sql).head()
    assert(row.getBoolean(0) && !row.getBoolean(1))
  }

  test("now-family binds to the per-record epoch column") {
    val r = Dialect.translate(
      "NOW() > x AND CURRENT_TIMESTAMP > y AND CURRENT_DATE = d",
      epochTimeColumn = Some("__epoch_time__"))
    assert(r.contains("timestamp_millis(__epoch_time__) > x"))
    assert(r.contains("timestamp_millis(__epoch_time__) > y"))
    assert(r.contains("to_date(timestamp_millis(__epoch_time__)) = d"))
    // without the column the functions pass through untouched
    assert(Dialect.translate("NOW() > x") == "NOW() > x")
  }

  test("TIMESTAMP_DIFF alias and rewritten SQL parse and evaluate in Spark") {
    assert(Dialect.translate("TIMESTAMP_DIFF(DAY, a, b)") == "TIMESTAMPDIFF(DAY, a, b)")
    val sql = Dialect.translate(
      "SELECT 'abc' LIKE 'a.c' AS m, TIMESTAMP_DIFF(DAY, TIMESTAMP'2024-01-01', TIMESTAMP'2024-01-31') AS d")
    val row = spark.sql(sql).head()
    assert(row.getBoolean(0) && row.getLong(1) == 30L)
  }

  test("SimpleDateFormat pattern translation: u -> e outside quoted sections") {
    assert(Dialect.translateDatePattern("yyyy-MM-dd u") == "yyyy-MM-dd e")
    assert(Dialect.translateDatePattern("'u literal' u") == "'u literal' e")
    assert(Dialect.translateDatePattern("HH:mm:ss.SSS") == "HH:mm:ss.SSS")
  }
}
