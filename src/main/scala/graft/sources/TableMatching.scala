package graft.sources

import graft.core.{Selectors, TableId}

/** Source-table capture-list resolution — the reference's
  * `MySqlDataSourceFactory` table matching
  * (`pipeline-connector-mysql/.../factory/MySqlDataSourceFactory.java:226-259`
  * eager path, `validateTableAndReturnDebeziumStyle:536-568` lazy path):
  *
  *  - '''Eager''' (default): the `tables` selector list resolves against the
  *    LISTED catalog through [[Selectors]] (include minus `tables.exclude`),
  *    refusing with the reference's wording when either side matches nothing.
  *  - '''Lazy''' (`scan.binlog.newly-added-table.enabled`): the selector
  *    list is rewritten to ONE Debezium-style regex (commas → `|`, dots
  *    re-escaped: the selector's `\.` is a regex metachar and its bare `.`
  *    the db/table separator — the regex needs the opposite), so tables
  *    created AFTER startup still match. The two modes are mutually
  *    exclusive with `scan.newly-added-table.enabled`.
  */
object TableMatching {

  /** Eager resolution: concrete table identifiers captured at startup. */
  def resolveCapturedTables(
      available: Seq[TableId],
      tables: String,
      tablesExclude: Option[String] = None): Seq[String] = {
    val selectors = Selectors.parse(tables)
    val captured =
      scala.collection.mutable.ArrayBuffer(
        available.filter(selectors.isMatch).map(_.identifier): _*)
    if (captured.isEmpty)
      throw new IllegalArgumentException(
        "Cannot find any table by the option 'tables' = " + tables)
    tablesExclude.foreach { ex =>
      val excludeSel = Selectors.parse(ex)
      val excluded = available.filter(excludeSel.isMatch).map(_.identifier).toSet
      if (excluded.nonEmpty) captured.filterInPlace(!excluded.contains(_))
      if (captured.isEmpty)
        throw new IllegalArgumentException(
          "Cannot find any table with by the option 'tables.exclude'  = " + ex)
    }
    captured.toSeq
  }

  private val DotPlaceholder = "_$dot_placeholder$_"

  /** `validateTableAndReturnDebeziumStyle`: the CDC selector list as one
    * Debezium regex — `db.tbl1,db2.tbl\.*` → `db\.tbl1|db2\.tbl.*`.
    */
  def toDebeziumStyleRegex(tables: String): String =
    tables.split(",").map(_.trim).mkString("|")
      .replace("\\.", DotPlaceholder) // selector `\.` = regex any-char, park it
      .replace(".", "\\.")            // bare `.` = db/table separator, quote it
      .replace(DotPlaceholder, ".")   // restore the parked metachars

  /** `MySqlDataSourceFactory.java:228-231`. */
  def requireExclusiveNewlyAddedModes(
      scanBinlogNewlyAddedTable: Boolean, scanNewlyAddedTable: Boolean): Unit =
    if (scanBinlogNewlyAddedTable && scanNewlyAddedTable)
      throw new IllegalArgumentException(
        "If both scan.binlog.newly-added-table.enabled and " +
          "scan.newly-added-table.enabled are true, data maybe duplicate after restore")
}
