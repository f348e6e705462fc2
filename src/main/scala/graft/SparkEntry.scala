package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area registries ([[QueriesCore]],
  * [[QueriesML]]); every entry with an `oracleSql` is hash-compared against
  * DuckDB at sf0.01 by the driver, the rest get rows-only checks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.queries("q3_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesML.queries ++ QueriesRelational.queries ++
      QueriesCdc.queries ++ QueriesConformance.queries ++ QueriesE2e.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (m_media_* binary plumbing) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesML.oracles ++ QueriesRelational.oracles ++
      QueriesCdc.oracles ++ QueriesConformance.oracles ++ QueriesE2e.oracles

  /** SURVEY.md §2 component → the oracle gates that cover it, so a driver
    * run can self-report per-component correctness (see [[Coverage]]).
    */
  def components: Map[String, Seq[String]] = Coverage.components
}
