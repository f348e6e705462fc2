package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The transform-dialect rewrites (`TransformSqlOperatorTable` →
  * Spark SQL): LIKE-as-regex, epoch-time binding, alias spellings.
  */
class DialectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("CAST rewriting: dialect targets to graft_cast, VARCHAR to STRING") {
    assert(Dialect.translate("CAST(id AS VARCHAR)") == "CAST(id AS STRING)")
    assert(Dialect.translate("CAST(name AS VARCHAR(17))") == "CAST(name AS STRING)")
    assert(Dialect.translate("CAST(x AS TINYINT)") == "graft_cast(x, 'TINYINT')")
    assert(Dialect.translate("CAST(x AS DECIMAL(19, 10))") == "graft_cast(x, 'DECIMAL(19,10)')")
    // nested: inner cast rewritten inside the outer operand
    assert(Dialect.translate("CAST(CAST(id AS VARCHAR) || ' -> ' || name AS VARCHAR)") ==
      "CAST(CAST(id AS STRING) || ' -> ' || name AS STRING)")
    // non-dialect targets keep native CAST; literals with AS inside stay put
    assert(Dialect.translate("CAST(d AS DATE)") == "CAST(d AS DATE)")
    assert(Dialect.translate("CAST('x AS y' AS DOUBLE)") == "graft_cast('x AS y', 'DOUBLE')")
    // a LIKE inside a cast operand still rewrites
    assert(Dialect.translate("CAST(name LIKE 'li' AS BOOLEAN)") ==
      "graft_cast(name RLIKE 'li', 'BOOLEAN')")
  }

  test("graft_cast: never-throwing reference cast semantics") {
    DialectCastExpr.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cast('foo', 'TINYINT') AS bad_str,
        |  graft_cast('12.13', 'INT') AS dec_str,
        |  graft_cast(-6.7D, 'INT') AS trunc_neg,
        |  graft_cast('foo', 'BOOLEAN') AS bool_bad,
        |  graft_cast('TRUE', 'BOOLEAN') AS bool_true,
        |  graft_cast(2, 'BOOLEAN') AS bool_num,
        |  graft_cast(CAST(-10.11 AS DECIMAL(10,2)), 'DECIMAL(1,0)') AS dec_overflow,
        |  graft_cast(CAST(-6.7 AS DECIMAL(10,2)), 'DECIMAL(1,0)') AS dec_round,
        |  graft_cast(CAST(-6.7 AS FLOAT), 'DOUBLE') AS widen,
        |  graft_cast(CAST(-6.7 AS FLOAT), 'DECIMAL(19,10)') AS via_str
        |""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 12)
    assert(r.getInt(2) == -6)
    assert(!r.getBoolean(3))
    assert(r.getBoolean(4))
    assert(r.getBoolean(5))
    assert(r.isNullAt(6))
    assert(r.getDecimal(7).toPlainString == "-7")
    assert(r.getDouble(8) == -6.699999809265137)
    assert(r.getDecimal(9).toPlainString == "-6.7000000000")
  }

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

  test("non-UTC zone: NOW stays the UNSHIFTED instant, LOCALTIMESTAMP shifts") {
    // SystemFunctionUtils.currentTimestamp:56/now:61 return the raw epoch
    // instant; only localtimestamp:65 (and time/date parts) shift into the
    // pipeline zone
    val r = Dialect.translate(
      "NOW() > x AND LOCALTIMESTAMP > y AND CURRENT_DATE = d",
      epochTimeColumn = Some("__e__"), timeZone = "Asia/Shanghai")
    assert(r.contains("timestamp_millis(__e__) > x"),
      s"NOW must stay unshifted, got $r")
    assert(r.contains("from_utc_timestamp(timestamp_millis(__e__), 'Asia/Shanghai') > y"))
    assert(r.contains("to_date(from_utc_timestamp(timestamp_millis(__e__), 'Asia/Shanghai')) = d"))
    // CAST(NOW() AS TIMESTAMP) goes through castToTimestamp(LTZ, tz):1031 —
    // the ONE cast point where the zone reappears
    val c = Dialect.translate("CAST(NOW() AS TIMESTAMP)",
      epochTimeColumn = Some("__e__"), timeZone = "Asia/Shanghai")
    assert(c.contains("from_utc_timestamp"), s"cast-to-TIMESTAMP must shift, got $c")
  }

  test("graft_round accepts negative and expression scales (non-decimal operands)") {
    DialectCastExpr.ensureRegistered(spark)
    val row = spark.sql(
      "SELECT graft_round(12345, -2) AS a, graft_round(5.555D, 1 + 1) AS b, " +
        "graft_round(CAST(5.555 AS FLOAT), 2) AS c").head()
    assert(row.getInt(0) == 12300)
    assert(row.getDouble(1) == 5.56)
    assert(row.getFloat(2) == 5.56f)
  }

  test("TIMESTAMP_DIFF alias and rewritten SQL parse and evaluate in Spark") {
    // both spellings route to graft_timestampdiff, which types INTEGER like
    // the reference operator (see DialectParserSpec's value matrix)
    assert(Dialect.translate("TIMESTAMP_DIFF(DAY, a, b)") ==
      "graft_timestampdiff('DAY', a, b)")
    DialectCastExpr.ensureRegistered(spark)
    val sql = Dialect.translate(
      "SELECT 'abc' LIKE 'a.c' AS m, TIMESTAMP_DIFF(DAY, TIMESTAMP'2024-01-01', TIMESTAMP'2024-01-31') AS d")
    val row = spark.sql(sql).head()
    assert(row.getBoolean(0) && row.getInt(1) == 30)
  }

  test("SimpleDateFormat pattern translation: u -> e outside quoted sections") {
    assert(Dialect.translateDatePattern("yyyy-MM-dd u") == "yyyy-MM-dd e")
    assert(Dialect.translateDatePattern("'u literal' u") == "'u literal' e")
    assert(Dialect.translateDatePattern("HH:mm:ss.SSS") == "HH:mm:ss.SSS")
  }
}
