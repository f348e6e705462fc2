package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: most recent right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-01 11:00:00"), "e3"))
      .toDF("k", "lts", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (2L, ts("2024-01-01 11:00:00"), "r3")) // EQUAL ts: inclusive <= matches
      .toDF("k", "rts", "rv")

    val out = AsOfJoin.asofJoin(left, right, "k", "lts", "rts")
      .select($"ev", $"rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map(
      "e0" -> null, // no right row at or before 09:00
      "e1" -> "r1", // 09:30 is the latest <= 10:00
      "e2" -> "r2", // 11:00 supersedes 09:30
      "e3" -> "r3")) // equal timestamps match (inclusive)
  }

  test("asofJoin plan: one window pass, no cartesian/range candidate explosion") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "lts", "ev")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "y")).toDF("k", "rts", "rv")
    val plan = AsOfJoin.asofJoin(left, right, "k", "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
