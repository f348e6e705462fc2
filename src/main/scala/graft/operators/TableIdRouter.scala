package graft.operators

import graft.core.{Selectors, TableId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Route rule: regex-matched source tables → renamed/merged sink tables.
  * Mirrors `flink-cdc-composer/.../definition/RouteDef.java` +
  * `flink-cdc-runtime/.../schema/common/TableIdRouter.java:42-118`.
  */
final case class RouteRule(
    sourceTable: String,
    sinkTable: String,
    replaceSymbol: Option[String] = None,
    description: Option[String] = None)

/** Pure routing function + its data-plane form (broadcast mapping join).
  *
  * Semantics (`TableIdRouter.calculateRoute:81-93`): every matching rule
  * produces one sink table (1→N fanout when several rules match); a table
  * matching no rule routes to itself. `replaceSymbol` substitutes the source
  * TABLE NAME into the sink-table string (`resolveReplacement:95-101`).
  */
final class TableIdRouter(rules: Seq[RouteRule]) {

  private val compiled: Seq[(Selectors, RouteRule)] =
    rules.map(r => (Selectors.parse(r.sourceTable), r))

  def route(sourceTableId: TableId): Seq[TableId] = {
    val routed = compiled.collect {
      case (sel, rule) if sel.isMatch(sourceTableId) =>
        rule.replaceSymbol match {
          case Some(sym) =>
            TableId.parse(rule.sinkTable.replace(sym, sourceTableId.tableName))
          case None => TableId.parse(rule.sinkTable)
        }
    }
    if (routed.isEmpty) Seq(sourceTableId) else routed
  }

  /** `groupSourceTablesByRouteRule` (reference :110-140): tables matching the
    * same rule get merged schemas (see SchemaMerging.mergeAll).
    */
  def groupByRule(tableIds: Set[TableId]): Seq[Set[TableId]] =
    compiled.map { case (sel, _) => tableIds.filter(sel.isMatch) }.filter(_.nonEmpty)

  /** Data-plane routing: add `sinkTableId` to an envelope DataFrame.
    *
    * The mapping (sourceTableId → sinkTableId) is computed on the driver for
    * the known set of tables and broadcast-joined — the fanout (1→N) falls out
    * of join multiplicity, and no shuffle of the event stream happens here
    * (the PK-hash repartition downstream is the only shuffle, as in the
    * reference topology).
    */
  def annotate(env: DataFrame, knownTables: Seq[TableId])(implicit
      spark: SparkSession): DataFrame = {
    import spark.implicits._
    val mapping = knownTables.flatMap(t => route(t).map(s => (t.identifier, s.identifier)))
    val mappingDf = mapping.toDF(Envelope.TableIdCol, "sinkTableId")
    env.join(broadcast(mappingDf), Seq(Envelope.TableIdCol), "inner")
  }
}
