package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval: exact overlap semantics, one row per (point, interval)") {
    val points = Seq(
      (1L, ts("2024-01-05 00:00:00")), // inside w1 only
      (2L, ts("2024-01-10 00:00:00")), // inside w1 AND w2 (overlapping windows)
      (3L, ts("2024-02-01 00:00:00"))) // inside nothing
      .toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")), // w1 (hi inclusive)
      (20L, ts("2024-01-08 00:00:00"), ts("2024-01-20 00:00:00"))) // w2
      .toDF("wid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", 86400L)
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("pointInInterval plans as a hash join on bins, not a nested loop") {
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("pid", "ts")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")))
      .toDF("wid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }
}
