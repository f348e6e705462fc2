package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational features the reference deliberately lacks (SURVEY §2.5 "absent
  * relational features") and that the Spark engine provides for free: semi /
  * anti joins, set operations, grouping sets, subqueries. Included so a user
  * of the reference moving to this engine gets the full SQL surface, each
  * verified against DuckDB.
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_semi_join" -> ((s, dir) => {
      // customers that have at least one order (EXISTS)
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "r_anti_join" -> ((s, dir) => {
      // customers with no orders (NOT EXISTS)
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "r_setops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_nationkey"))
      val bld = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      auto.intersect(bld)
        .unionByName(auto.except(bld).withColumn("c_nationkey", col("c_nationkey") + 1000))
        .distinct()
        .orderBy("c_nationkey")
    }),
    "r_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    }),
    "r_asof_join" -> ((s, dir) => {
      // AS-OF join (the temporal join Spark lacks; graft.operators.AsOfJoin):
      // each event matched to the user's most recent order AT event time.
      // The right side is deduped to one row per (key, ts) so the match is
      // deterministic on both engines (DuckDB picks arbitrarily on ties).
      import graft.operators.AsOfJoin
      val ev = t(s, dir, "events").filter(col("user_id") < 100)
        .select(col("user_id").as("k"), col("ts").cast("timestamp").as("ts"),
          col("event_id"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("ots"))
        .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey"))
          .as("__o"))
        .select(col("k"), col("ots"), col("__o.o_orderkey"), col("__o.o_totalprice"))
      AsOfJoin.asofJoin(ev, ord, "k", "ts", "ots")
        .select(col("event_id"), col("k").as("user_id"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("event_id")
    }),
    "r_range_join" -> ((s, dir) => {
      // pure range join (no equi key) via interval binning: events matched to
      // overlapping 7-day "promo windows" as a HASH join on bin keys, not a
      // BroadcastNestedLoopJoin over the cross product
      import graft.operators.RangeJoin
      val ev = t(s, dir, "events").filter(col("event_id") < 500)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
      val windows = t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
        .select(
          col("o_orderkey").as("window_id"),
          col("o_orderdate").cast("timestamp").as("lo"),
          (col("o_orderdate").cast("timestamp") + expr("INTERVAL 7 DAYS")).as("hi"))
      RangeJoin.pointInInterval(ev, "ts", windows, "lo", "hi", binWidthSec = 7L * 86400)
        .select(col("event_id"), col("window_id"))
        .orderBy("event_id", "window_id")
    }),
    "r_cube" -> ((s, dir) => {
      // CUBE + grouping_id: all four grouping combinations in ONE pass —
      // Spark expands the cube map-side, still a single hash-aggregate
      // shuffle (vs four separate scans)
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"))
        .orderBy("rf", "ls", "gid")
    }),
    "r_pivot" -> ((s, dir) => {
      // PIVOT: order counts + exact-decimal totals per (priority, status)
      // rotated to one column set per status. Spark compiles pivot to ONE
      // hash aggregate over (priority) with per-status conditional
      // aggregates — map-side partials, a single shuffle, no per-status
      // scan. Values are enumerated explicitly: at 100 TB an implicit
      // distinct-scan to discover pivot columns would be its own job.
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .select(
          col("o_orderpriority"),
          coalesce(col("F_n"), lit(0L)).as("f_n"),
          col("F_total").cast("double").as("f_total"),
          coalesce(col("O_n"), lit(0L)).as("o_n"),
          col("O_total").cast("double").as("o_total"),
          coalesce(col("P_n"), lit(0L)).as("p_n"),
          col("P_total").cast("double").as("p_total"))
        .orderBy("o_orderpriority")
    }),
    "r_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS (finer than cube/rollup: exactly the
      // requested combinations) + grouping_id disambiguation — one
      // hash-aggregate pass expanding only the three listed sets
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("gid"), col("n"), col("total"))
        .orderBy("prio", "status", "gid")
    }),
    "r_unpivot" -> ((s, dir) => {
      // UNPIVOT (wide→long melt): per-line measures rotate into
      // (measure, val) rows — Spark's Expand node emits all three output
      // rows per input row in ONE map-only pass, no three-scan UNION
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),
    "r_arrays" -> ((s, dir) => {
      // array construction + element access (absent in the reference,
      // SURVEY §2.5): per-customer sorted order list, derived scalars only
      // (deterministic under sort_array)
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(col("o_orderkey"))).as("orders"))
        .select(
          col("o_custkey"),
          size(col("orders")).as("n"),
          element_at(col("orders"), 1).as("first_order"),
          element_at(col("orders"), -1).as("last_order"))
        .orderBy("o_custkey")
    }),
    "r_subquery" -> ((s, dir) => {
      // orders above the average total price: the scalar subquery stays
      // IN-PLAN as a broadcast single-row cross join — one job, no driver
      // round-trip (a collected scalar would serialize the plan on the
      // driver between two jobs)
      val o = t(s, dir, "orders")
      val avgDf = o.agg(avg(col("o_totalprice")).as("__avg_price"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("__avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    "r_exists_corr" -> ((s, dir) => {
      // orders with at least one high-quantity line (correlated EXISTS via semi)
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      o.join(li.filter(col("l_quantity") >= 45), o("o_orderkey") === li("l_orderkey"),
        "left_semi")
        .select(col("o_orderkey"))
        .orderBy("o_orderkey")
    }))

  val oracles: Map[String, String] = Map(
    "r_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "r_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "r_setops" ->
      """SELECT DISTINCT c_nationkey FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment='AUTOMOBILE'
        |  INTERSECT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment='BUILDING'
        |  UNION
        |  SELECT c_nationkey + 1000 FROM (
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment='AUTOMOBILE'
        |    EXCEPT
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment='BUILDING')
        |) ORDER BY c_nationkey""".stripMargin,
    "r_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "r_range_join" ->
      """WITH w AS (
        |  SELECT o_orderkey AS window_id, CAST(o_orderdate AS TIMESTAMP) AS lo,
        |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 DAY AS hi
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_id < 500)
        |SELECT e.event_id, w.window_id
        |FROM e JOIN w ON e.ts BETWEEN w.lo AND w.hi
        |ORDER BY e.event_id, w.window_id""".stripMargin,
    "r_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |    max(o_orderkey) AS o_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2),
        |e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE user_id < 100)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM e ASOF LEFT JOIN o ON e.user_id = o.k AND e.ts >= o.ots
        |ORDER BY e.event_id""".stripMargin,
    "r_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin,
    // CASE-free portable pivot: per-status FILTER aggregates
    "r_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "r_grouping_sets" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  CAST(2 * GROUPING(o_orderpriority) + GROUPING(o_orderstatus) AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY prio, status, gid""".stripMargin,
    "r_unpivot" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DOUBLE) AS quantity,
        |    CAST(l_discount AS DOUBLE) AS discount,
        |    CAST(l_tax AS DOUBLE) AS tax
        |  FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, 'quantity' AS measure, quantity AS val FROM li
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', discount FROM li
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax', tax FROM li
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "r_arrays" ->
      """SELECT o_custkey, CAST(len(l) AS INT) AS n, l[1] AS first_order,
        |  l[-1] AS last_order
        |FROM (SELECT o_custkey, list_sort(list(o_orderkey)) AS l
        |      FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "r_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "r_exists_corr" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin)
}
