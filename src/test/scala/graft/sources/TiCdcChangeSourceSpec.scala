package graft.sources

import graft.core._
import graft.sources.tidb.TiCdcChangeSource
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TiCdcChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("test.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource() =
    new TiCdcChangeSource(tid, schema,
      (0L until 160L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))

  private def upd(id: Long, v: String) =
    DataChangeEvent.update(tid, Map("id" -> id), Map("id" -> id, "v" -> v))

  test("two-phase rows: prewrite invisible, commit applies + buffers, rollback discards") {
    val s = newSource()
    s.prewrite(10L, upd(1L, "x"))
    assert(s.pendingPrewriteCount == 1 && s.bufferedCommitCount == 0)
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "init")))
    s.commitRow(10L, 20L)
    assert(s.pendingPrewriteCount == 0 && s.bufferedCommitCount == 1)
    assert(s.snapshotRead(Some(1L), Some(2L)) == Seq(Map("id" -> 1L, "v" -> "x")))
    s.prewrite(30L, upd(2L, "POISON"))
    s.rollbackRow(30L)
    assert(s.pendingPrewriteCount == 0 && s.bufferedCommitCount == 1)
    assert(s.snapshotRead(Some(2L), Some(3L)) == Seq(Map("id" -> 2L, "v" -> "init")))
    intercept[IllegalStateException](s.commitRow(30L, 40L)) // gone
  }

  test("the global watermark is the MIN resolved ts; a laggard region holds everything") {
    val s = newSource()
    // keys 1 (region 0), 60 (region 1), 110 (region 2)
    s.writeCommitted(10L, 11L, upd(1L, "r0"))
    s.writeCommitted(12L, 13L, upd(60L, "r1"))
    s.writeCommitted(14L, 15L, upd(110L, "r2"))
    s.advanceResolved(0, 100L)
    s.advanceResolved(1, 100L)
    assert(s.globalResolvedTs == 0L) // region 2 never resolved
    assert(s.readLog(0L, s.currentOffset).isEmpty,
      "commits above the watermark must stay buffered")
    s.advanceResolved(2, 12L) // partially: releases ONLY commitTs <= 12
    val part = s.readLog(0L, s.currentOffset)
    assert(part.map(_.event.asInstanceOf[DataChangeEvent].after("v")) == Seq("r0"))
    s.advanceResolved(2, 100L)
    val all = s.readLog(0L, s.currentOffset)
    assert(all.map(_.event.asInstanceOf[DataChangeEvent].after("v")) == Seq("r0", "r1", "r2"))
    intercept[IllegalArgumentException](s.advanceResolved(2, 50L)) // only forward
  }

  test("the sorter: shuffled arrival, commit-ts-ordered emission, monotone packed offsets") {
    val s = newSource()
    // submit out of commit-ts order entirely within region 0
    s.prewrite(10L, upd(1L, "third")); s.prewrite(20L, upd(2L, "first"))
    s.prewrite(30L, upd(3L, "second"))
    s.commitRow(30L, 200L); s.commitRow(10L, 300L); s.commitRow(20L, 100L)
    s.advanceAllResolved(1000L)
    val recs = s.readLog(0L, s.currentOffset)
    assert(recs.map(_.event.asInstanceOf[DataChangeEvent].after("v")) ==
      Seq("first", "second", "third"))
    val offs = recs.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
    assert(recs.map(_.event.asInstanceOf[DataChangeEvent].meta("commit_ts")) ==
      Seq("100", "200", "300"))
  }

  test("an ambiguous startTs across regions is rejected, not resolved by iteration order") {
    val s = newSource()
    s.prewrite(10L, upd(1L, "region0"))
    s.prewrite(10L, upd(60L, "region1")) // same startTs, different region — allowed
    val e = intercept[IllegalArgumentException](s.commitRow(10L, 20L))
    assert(e.getMessage.contains("ambiguous"))
    intercept[IllegalArgumentException](s.rollbackRow(10L))
    assert(s.pendingPrewriteCount == 2, "neither row may be consumed on ambiguity")
  }

  test("a commit at or below the region's resolved ts is rejected (the promise)") {
    val s = newSource()
    s.advanceResolved(0, 50L)
    s.prewrite(10L, upd(1L, "late"))
    intercept[IllegalArgumentException](s.commitRow(10L, 50L))
    intercept[IllegalArgumentException](s.commitRow(10L, 40L))
    s.commitRow(10L, 51L) // just past the promise is fine
  }

  test("multi-row transactions share a commit ts but keep distinct monotone offsets") {
    val s = newSource()
    s.prewrite(10L, upd(1L, "a")); s.prewrite(11L, upd(2L, "b"))
    s.commitRow(10L, 100L); s.commitRow(11L, 100L) // same txn commit ts
    s.advanceAllResolved(200L)
    val recs = s.readLog(0L, s.currentOffset)
    assert(recs.size == 2 && recs.map(_.offset).distinct.size == 2)
    assert(recs.forall(_.event.asInstanceOf[DataChangeEvent].meta("commit_ts") == "100"))
    // half-open range splits between the two rows of one transaction
    assert(s.readLog(recs(0).offset, recs(1).offset).map(_.offset) == Seq(recs(1).offset))
  }

  test("region split: children inherit the parent's resolved ts — the watermark never regresses") {
    val s = newSource()
    s.advanceAllResolved(100L)
    s.writeCommitted(110L, 111L, upd(10L, "pre-split"))
    assert(s.globalResolvedTs == 100L)
    // a prewrite in flight across the split re-homes to its new region
    s.prewrite(120L, upd(30L, "in-flight"))
    s.splitRegion(0, at = 25L) // [0,50) -> [0,25) + [25,50)
    assert(s.regionCount == 4)
    // the watermark did NOT regress: the child inherited resolved=100
    assert(s.globalResolvedTs == 100L,
      "a child region starting at resolved=0 would stall emission forever")
    // routing follows the new topology; the inherited promise binds children
    assert(s.regionOf(10L) == 0 && s.regionOf(30L) == 1 && s.regionOf(60L) == 2)
    intercept[IllegalArgumentException](s.commitRow(120L, 90L)) // below inherited resolved
    s.commitRow(120L, 130L) // above it is fine, on the re-homed region
    s.advanceAllResolved(200L)
    val recs = s.readLog(0L, s.currentOffset)
      .map(_.event.asInstanceOf[DataChangeEvent].after("v"))
    assert(recs == Seq("pre-split", "in-flight"),
      "offsets are timestamps: emission is unaffected by the topology change")
  }

  test("offsetAtTimestamp and capped windows never emit past the watermark") {
    val s = newSource()
    s.writeCommitted(10L, 11L, upd(1L, "a"), tsMillis = 1000L)
    s.writeCommitted(12L, 13L, upd(2L, "b"), tsMillis = 2000L)
    // idle regions heartbeat far ahead; the data-bearing region is the min
    s.advanceResolved(1, 1000L); s.advanceResolved(2, 1000L)
    s.advanceResolved(0, 12L) // only "a" is below the watermark
    // even an explicit window far past the head is capped at the promise
    assert(s.readLog(0L, Long.MaxValue >> 1)
      .map(_.event.asInstanceOf[DataChangeEvent].after("v")) == Seq("a"))
    s.advanceAllResolved(2000L)
    val at = s.offsetAtTimestamp(1500L)
    assert(s.readLog(at, s.currentOffset)
      .map(_.event.asInstanceOf[DataChangeEvent].after("v")) == Seq("b"))
  }
}
