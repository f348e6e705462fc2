package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for driver-contract queries: correctness is covered
  * by the DuckDB oracle; these tests pin the EXECUTION shape that matters at
  * 100 TB (mirroring DedupSpec's no-CartesianProduct checks).
  */
class QueryPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf0001

  test("q_window executes as an aggregate with map-side partial, not a window") {
    val df = QueriesCore.queries("q_window")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator in plan:\n$plan")
    // the scale property: a PARTIAL aggregate runs before the exchange, so
    // the shuffle carries one row per (scan partition, key) instead of every
    // lineitem row (the window plan's failure mode at 100 TB)
    assert(plan.contains("partial_min_by"), s"no map-side partial aggregation:\n$plan")
  }

  test("r_subquery stays in-plan: scalar broadcast join, no second job") {
    val df = QueriesRelational.queries("r_subquery")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the single-row aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t_udf2: multi-arity typed UDF through the lifecycle registry") {
    val rows = QueriesCore.queries("t_udf2")(spark, sf).limit(3).collect()
    rows.foreach { r =>
      assert(r.getLong(1) / 100L == r.getLong(0)) // mix encodes the key
    }
  }
}
