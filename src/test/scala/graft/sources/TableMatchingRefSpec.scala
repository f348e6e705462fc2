package graft.sources

import graft.core.TableId
import graft.sources.TableMatching._
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 transcription of
  * `pipeline-connector-mysql/src/test/.../MySqlTablePatternMatchingTest.java`
  * over its 7-table catalog — the generic methods pin both the EAGER
  * selector resolution and the LAZY Debezium-regex rewrite; the
  * `*RealTables` twins run the same expectations through a live pipeline
  * and are subsumed by these plus the `c_*` pipeline gates.
  */
class TableMatchingRefSpec extends AnyFunSuite {

  private val catalog = Seq(
    "db.tbl1", "db.tbl2", "db.tbl3", "db.tbl4",
    "db2.tbl2", "db3.tbl3", "db4.tbl4").map(TableId.parse)

  private def matched(tables: String, exclude: String = null): Seq[String] =
    resolveCapturedTables(catalog, tables, Option(exclude))

  // testWildcardMatching:91
  test("wildcard matching: eager resolves all, lazy keeps one regex") {
    assert(matched("\\.*.\\.*").toSet == Set(
      "db.tbl1", "db.tbl2", "db.tbl3", "db.tbl4", "db2.tbl2", "db3.tbl3", "db4.tbl4"))
    assert(toDebeziumStyleRegex("\\.*.\\.*") == ".*\\..*")
  }

  // testWildcardMatchingDatabases:107
  test("wildcard databases with table range") {
    assert(matched("\\.*.tbl[3-4]").toSet ==
      Set("db.tbl3", "db.tbl4", "db3.tbl3", "db4.tbl4"))
    assert(toDebeziumStyleRegex("\\.*.tbl[3-4]") == ".*\\.tbl[3-4]")
  }

  // testWildcardMatchingTables:116
  test("wildcard tables under one database") {
    assert(matched("db.\\.*").toSet == Set("db.tbl1", "db.tbl2", "db.tbl3", "db.tbl4"))
    assert(toDebeziumStyleRegex("db.\\.*") == "db\\..*")
  }

  // testWildcardMatchingPartialDatabases:125 — `db\..` is db + regex any-char:
  // matches db2/db3/db4, NOT db (full-component match)
  test("partial database wildcard excludes the bare name") {
    assert(matched("db\\..\\.*").toSet == Set("db2.tbl2", "db3.tbl3", "db4.tbl4"))
    assert(toDebeziumStyleRegex("db\\..\\.*") == "db.\\..*")
  }

  // testWildcardMatchingWithExclusion:135 — the exclusion is component-exact:
  // `db.tbl3` removes only db.tbl3, never db3.tbl3
  test("exclusion removes exactly the excluded selector's matches") {
    assert(matched("\\.*.\\.*", "db.tbl3").toSet == Set(
      "db.tbl1", "db.tbl2", "db.tbl4", "db2.tbl2", "db3.tbl3", "db4.tbl4"))
  }

  // testWildcardMatchingDatabasesWithExclusion:142
  test("exclusion with range patterns") {
    assert(matched("\\.*.tbl[3-4]", "db.tbl[3-4]").toSet ==
      Set("db3.tbl3", "db4.tbl4"))
  }

  // testWildcardMatchingTablesWithExclusion:148
  test("single-table exclusion under one database") {
    assert(matched("db.\\.*", "db.tbl4").toSet == Set("db.tbl1", "db.tbl2", "db.tbl3"))
  }

  // testWildcardMatchingPartialDatabasesWithExclusion:154
  test("partial-database include with whole-database exclusion") {
    assert(matched("db\\..\\.*", "db3.\\.*").toSet == Set("db2.tbl2", "db4.tbl4"))
  }

  // testMatchingTablesWithMultipleRules:161
  test("multiple comma-separated rules") {
    assert(matched("db.tbl1,db2.tbl\\.*,db3.tbl3").toSet ==
      Set("db.tbl1", "db2.tbl2", "db3.tbl3"))
    assert(toDebeziumStyleRegex("db.tbl1,db2.tbl\\.*,db3.tbl3") ==
      "db\\.tbl1|db2\\.tbl.*|db3\\.tbl3")
  }

  // testMatchingTablesWithSpacedRules:170 — whitespace around commas trims
  test("spaced rules trim to the same result") {
    val spaced = Seq(
      "db.tbl1, db2.tbl\\.*, db3.tbl3",
      "db.tbl1 ,db2.tbl\\.* ,db3.tbl3",
      "db.tbl1 , db2.tbl\\.* , db3.tbl3")
    spaced.foreach { rule =>
      assert(matched(rule).toSet == Set("db.tbl1", "db2.tbl2", "db3.tbl3"), rule)
      assert(toDebeziumStyleRegex(rule) == "db\\.tbl1|db2\\.tbl.*|db3\\.tbl3", rule)
    }
  }

  // MySqlDataSourceFactory.java:241-256 — the refusal wordings (incl. the
  // reference's double space in the exclude message)
  test("empty matches refuse with the reference wordings") {
    val e1 = intercept[IllegalArgumentException](matched("nosuch.\\.*"))
    assert(e1.getMessage == "Cannot find any table by the option 'tables' = nosuch.\\.*")
    val e2 = intercept[IllegalArgumentException](matched("db.\\.*", "db.\\.*"))
    assert(e2.getMessage ==
      "Cannot find any table with by the option 'tables.exclude'  = db.\\.*")
  }

  // MySqlDataSourceFactory.java:228-231
  test("binlog-newly-added and newly-added modes are mutually exclusive") {
    requireExclusiveNewlyAddedModes(scanBinlogNewlyAddedTable = true,
      scanNewlyAddedTable = false)
    val e = intercept[IllegalArgumentException] {
      requireExclusiveNewlyAddedModes(scanBinlogNewlyAddedTable = true,
        scanNewlyAddedTable = true)
    }
    assert(e.getMessage.contains("data maybe duplicate after restore"))
  }
}
