package graft.sinks

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Time travel on import for all three interchange formats: a mirrored
  * table read AS OF an older Delta version / Iceberg snapshot id / Paimon
  * snapshot id reproduces exactly the state that commit saw; out-of-range
  * and expired ids refuse loudly. */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def newTable(): LakehouseTable = {
    val t = new LakehouseTable(spark,
      Files.createTempDirectory("graft_tt_src").toString)
    t.create(TableSchema(
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("k")), buckets = 2)
    t
  }

  private val noKeys = () => spark.range(0).select($"id".as("k"))

  /** Three commits: {1..4}, then upsert k=2 + add {5,6}, then delete k=1. */
  private def threeCommits(t: LakehouseTable): Unit = {
    t.merge((1L to 4L).map(k => (k, s"v$k")).toDF("k", "v"), noKeys())
    t.merge(Seq((2L, "V2"), (5L, "v5"), (6L, "v6")).toDF("k", "v"), noKeys())
    t.merge(spark.range(0).select($"id".as("k"), lit("").as("v")),
      Seq(Tuple1(1L)).toDF("k"))
  }

  private val stateAfter1 = Set((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, "v4"))
  private val stateAfter2 = Set((1L, "v1"), (2L, "V2"), (3L, "v3"), (4L, "v4"),
    (5L, "v5"), (6L, "v6"))
  private val stateAfter3 = stateAfter2 - ((1L, "v1"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("Delta: versionAsOf replays each commit's state; bad versions refuse") {
    val t = newTable()
    val dest = Files.createTempDirectory("graft_tt_dl").toString
    threeCommits(t)
    // the table CREATE itself mirrors as version 0 (empty state); the
    // three data commits land at versions 1..3
    assert(DeltaInterchange.mirror(spark, t, dest) == 4)
    assert(rows(DeltaInterchange.importDelta(spark, dest, Some(0L))).isEmpty)
    assert(rows(DeltaInterchange.importDelta(spark, dest, Some(1L))) == stateAfter1)
    assert(rows(DeltaInterchange.importDelta(spark, dest, Some(2L))) == stateAfter2)
    assert(rows(DeltaInterchange.importDelta(spark, dest, Some(3L))) == stateAfter3)
    assert(rows(DeltaInterchange.importDelta(spark, dest)) == stateAfter3)
    assert(intercept[IllegalArgumentException](
      DeltaInterchange.importDelta(spark, dest, Some(9L)))
      .getMessage.contains("versionAsOf"))
    // cleanup past a checkpoint: states below the checkpoint are GONE
    DeltaInterchange.checkpoint(spark, dest)
    DeltaInterchange.cleanupLog(dest)
    t.merge(Seq((7L, "v7")).toDF("k", "v"), noKeys())
    assert(DeltaInterchange.mirror(spark, t, dest) == 1)
    assert(rows(DeltaInterchange.importDelta(spark, dest, Some(3L))) == stateAfter3,
      "the checkpointed version itself is still reachable")
    assert(intercept[IllegalArgumentException](
      DeltaInterchange.importDelta(spark, dest, Some(2L)))
      .getMessage.contains("cleaned up"))
  }

  test("Iceberg: asOfSnapshotId replays each snapshot; expired ids refuse") {
    val t = newTable()
    val dest = Files.createTempDirectory("graft_tt_ib").toString
    threeCommits(t)
    assert(IcebergInterchange.mirror(spark, t, dest) == 3)
    val ids = IcebergInterchange.snapshotIds(dest)
    assert(ids.size == 3, s"three snapshots retained, got $ids")
    assert(rows(IcebergInterchange.importIceberg(spark, dest, Some(ids(0)))) == stateAfter1)
    assert(rows(IcebergInterchange.importIceberg(spark, dest, Some(ids(1)))) == stateAfter2)
    assert(rows(IcebergInterchange.importIceberg(spark, dest, Some(ids(2)))) == stateAfter3)
    assert(rows(IcebergInterchange.importIceberg(spark, dest)) == stateAfter3)
    assert(intercept[IllegalArgumentException](
      IcebergInterchange.importIceberg(spark, dest, Some(987654321L)))
      .getMessage.contains("expired or never existed"))
  }

  test("Paimon: asOfSnapshotId replays each snapshot; expired ids refuse") {
    val t = newTable()
    val dest = Files.createTempDirectory("graft_tt_pm").toString
    threeCommits(t)
    // snapshot 1 is the mirrored CREATE (empty); data commits are 2..4
    assert(PaimonInterchange.mirror(spark, t, dest) == 4)
    assert(rows(PaimonInterchange.importPaimon(spark, dest,
      asOfSnapshotId = Some(2L))) == stateAfter1)
    assert(rows(PaimonInterchange.importPaimon(spark, dest,
      asOfSnapshotId = Some(3L))) == stateAfter2)
    assert(rows(PaimonInterchange.importPaimon(spark, dest,
      asOfSnapshotId = Some(4L))) == stateAfter3)
    assert(rows(PaimonInterchange.importPaimon(spark, dest)) == stateAfter3)
    assert(intercept[IllegalArgumentException](
      PaimonInterchange.importPaimon(spark, dest, asOfSnapshotId = Some(9L)))
      .getMessage.contains("beyond LATEST"))
    val (dropped, _, _) = PaimonInterchange.expireSnapshots(dest, keepLast = 1)
    assert(dropped == 3)
    assert(intercept[IllegalArgumentException](
      PaimonInterchange.importPaimon(spark, dest, asOfSnapshotId = Some(2L)))
      .getMessage.contains("expired"))
    assert(rows(PaimonInterchange.importPaimon(spark, dest,
      asOfSnapshotId = Some(4L))) == stateAfter3,
      "the retained snapshot still time-travels after expiry")
  }
}
