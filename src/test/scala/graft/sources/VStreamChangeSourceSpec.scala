package graft.sources

import graft.core._
import graft.sources.vitess.{VGtid, VStreamChangeSource}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class VStreamChangeSourceSpec extends AnyFunSuite {

  private val tid = TableId.parse("commerce.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))),
    primaryKeys = Seq("id"))

  private def newSource() =
    new VStreamChangeSource(tid, schema,
      (0L until 160L).map(i => Map[String, Any]("id" -> i, "v" -> "init")))

  private def upd(id: Long, v: String) =
    DataChangeEvent.update(tid, Map("id" -> id), Map("id" -> id, "v" -> v))

  test("VGtid: pack/unpack round trip, monotone under any single-shard increment, range names") {
    val vg = VGtid(Vector(3L, 0L, 250L, 7L))
    assert(VGtid.unpack(vg.packed, 4) == vg)
    for (i <- 0 until 4) {
      val bumped = VGtid(vg.positions.updated(i, vg.positions(i) + 1))
      assert(bumped.packed > vg.packed, s"bumping shard $i must increase the packed value")
    }
    assert(VGtid.rangeNames(4) == Vector("-40", "40-80", "80-c0", "c0-"))
    assert(vg.asString == "e0[0:3,1:0,2:250,3:7]")
    intercept[IllegalArgumentException](VGtid(Vector(0x10000L)))
    // a newer epoch dominates ANY older-epoch position vector
    val later = VGtid(Vector(0L, 0L, 0L), epoch = 1)
    assert(later.packed > VGtid(Vector(0xfffL, 0xfffL, 0xfffL, 0xfffL)).packed)
    assert(VGtid.epochOf(later.packed) == 1)
    assert(VGtid.unpack(later.packed, 3) == later)
  }

  test("reshard: the split journals an epoch, new shards start at zero, others keep position") {
    val s = new VStreamChangeSource(tid, schema,
      (0L until 150L).map(i => Map[String, Any]("id" -> i, "v" -> "init")),
      initialShards = 2, shardSpan = 75L)
    s.write(upd(10L, "a")); s.write(upd(100L, "b")); s.write(upd(20L, "c"))
    val preCut = s.currentVGtid
    assert(preCut == VGtid(Vector(2L, 1L), 0))
    s.reshard(0) // [0,75) splits into [0,37) and [37,75)
    assert(s.nShards == 3)
    assert(s.currentVGtid == VGtid(Vector(0L, 0L, 1L), 1),
      "new shards at zero, the undisturbed shard keeps its position")
    assert(s.shardNames == Vector("-80_a", "-80_b", "80-"))
    val Seq((ep, oldName, newNames, cut)) = s.reshardJournal
    assert(ep == 1 && oldName == "-80" && newNames == Vector("-80_a", "-80_b") && cut == preCut)
    // routing follows the NEW topology
    assert(s.shardOf(10L) == 0 && s.shardOf(40L) == 1 && s.shardOf(100L) == 2)
    s.write(upd(40L, "d"))
    assert(s.currentVGtid == VGtid(Vector(0L, 1L, 1L), 1))
  }

  test("cross-epoch resume: a pre-reshard offset replays the old tail, then the new epoch") {
    val s = new VStreamChangeSource(tid, schema,
      (0L until 150L).map(i => Map[String, Any]("id" -> i, "v" -> "init")),
      initialShards = 2, shardSpan = 75L)
    s.write(upd(10L, "keep"))
    val mark = s.currentOffset // checkpoint BEFORE the cut
    s.write(upd(20L, "old-tail")) // still epoch 0
    s.reshard(0)
    s.write(upd(10L, "new-a")); s.write(upd(50L, "new-b")); s.write(upd(100L, "new-c"))
    val tail = s.readLog(mark, s.currentOffset)
    assert(tail.map(_.event.asInstanceOf[DataChangeEvent].after("v")) ==
      Seq("old-tail", "new-a", "new-b", "new-c"),
      "old epoch's unconsumed tail must replay before the new epoch's events")
    val offs = tail.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
    assert(VGtid.epochOf(offs.head) == 0 && VGtid.epochOf(offs.last) == 1)
    // resuming from a POST-reshard offset excludes the whole old epoch
    val tail2 = s.readLog(tail(1).offset, s.currentOffset)
    assert(tail2.map(_.event.asInstanceOf[DataChangeEvent].after("v")) == Seq("new-b", "new-c"))
  }

  test("keyspace routing: a key's whole history lives on its owning shard") {
    val s = newSource()
    assert(s.shardOf(0L) == 0 && s.shardOf(39L) == 0 && s.shardOf(40L) == 1)
    assert(s.shardOf(119L) == 2 && s.shardOf(120L) == 3 && s.shardOf(500L) == 3)
    s.write(upd(10L, "a")); s.write(upd(130L, "b")); s.write(upd(11L, "c"))
    assert(s.journalCountsByShard == Vector(2, 0, 0, 1))
    assert(s.currentVGtid.positions == Vector(2L, 0L, 0L, 1L))
    // a PK change may not cross shards (that is a resharding move)
    intercept[IllegalArgumentException](
      s.write(DataChangeEvent.update(tid, Map("id" -> 10L), Map("id" -> 90L, "v" -> "x"))))
  }

  test("the offset is a vector clock: resume unpacks per-shard positions exactly") {
    val s = newSource()
    // skewed writes: shard 0 races ahead, shard 3 trickles
    (0 until 6).foreach(i => s.write(upd((i % 3).toLong, s"s0-$i")))
    s.write(upd(125L, "s3-0"))
    val mark = s.currentOffset
    assert(VGtid.unpack(mark, 4).positions == Vector(6L, 0L, 0L, 1L))
    // more skew after the mark
    (0 until 3).foreach(i => s.write(upd(50L + i, s"s1-$i")))
    s.write(upd(1L, "s0-late"))
    s.write(upd(126L, "s3-late"))
    val tail = s.readLog(mark, s.currentOffset)
    assert(tail.size == 5)
    // each shard's replayed tail is exactly its own suffix, in order
    val byShard = tail.map(_.event.asInstanceOf[DataChangeEvent])
      .groupBy(_.meta("shard"))
      .view.mapValues(_.map(_.after("v"))).toMap
    assert(byShard == Map(
      "-40" -> Seq("s0-late"),
      "40-80" -> Seq("s1-0", "s1-1", "s1-2"),
      "c0-" -> Seq("s3-late")))
    // offsets strictly monotone along the merged stream
    val offs = tail.map(_.offset)
    assert(offs == offs.sorted && offs.distinct == offs)
  }

  test("per-shard order survives the merge; snapshot unions the shard tables") {
    val s = newSource()
    val writes = Seq(0L -> "a", 45L -> "b", 1L -> "c", 121L -> "d", 46L -> "e", 2L -> "f")
    writes.foreach { case (id, v) => s.write(upd(id, v)) }
    val recs = s.readLog(0L, s.currentOffset).map(_.event.asInstanceOf[DataChangeEvent])
    val shard0 = recs.filter(_.meta("shard") == "-40").map(_.after("v"))
    assert(shard0 == Seq("a", "c", "f"))
    assert(recs.filter(_.meta("shard") == "40-80").map(_.after("v")) == Seq("b", "e"))
    val snap = s.snapshotRead(Some(0L), Some(3L))
    assert(snap.map(_("v")).toSet == Set("a", "c", "f"))
    assert(s.keyStats == (Some(0L), Some(159L), 160L))
  }

  test("offsetAtTimestamp lands on a valid packed VGtid boundary") {
    val s = newSource()
    s.write(upd(0L, "a"), tsMillis = 1000L)
    s.write(upd(125L, "b"), tsMillis = 2000L)
    s.write(upd(1L, "c"), tsMillis = 3000L)
    val at = s.offsetAtTimestamp(1500L)
    val vg = VGtid.unpack(at, 4)
    assert(vg.positions == Vector(1L, 0L, 0L, 0L)) // after "a", before "b"
    val replay = s.readLog(at, s.currentOffset).map(_.event.asInstanceOf[DataChangeEvent])
    assert(replay.map(_.after("v")) == Seq("b", "c"))
    assert(s.offsetAtTimestamp(500L) == 0L) // before everything
  }
}
