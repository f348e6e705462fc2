package graft.sources.mysql

import graft.sources.mysql.Gtid._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class GtidSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  private val u1 = "24bc7850-2c16-11e6-a073-0242ac110002"
  private val u2 = "7145bf69-d1ca-11e5-a588-0242ac110004"

  test("parse/render round trip, interval coalescing, case-insensitive uuids") {
    val s = GtidSet.parse(s"${u1.toUpperCase}:1-3:4-5:9, $u2:7")
    // adjacent 1-3 and 4-5 coalesce; singletons render bare
    assert(s.render == s"$u1:1-5:9,$u2:7")
    assert(GtidSet.parse(s.render) == s)
    assert(GtidSet.parse("").isEmpty && GtidSet.parse(null).isEmpty)
    // overlapping intervals coalesce too
    assert(GtidSet.parse(s"$u1:1-10:5-12").render == s"$u1:1-12")
    intercept[IllegalArgumentException](GtidSet.parse(s"$u1:5-3"))
  }

  test("contains and advance") {
    val s = GtidSet.parse(s"$u1:1-5:9")
    assert(s.contains(u1, 3) && s.contains(u1.toUpperCase, 9))
    assert(!s.contains(u1, 6) && !s.contains(u2, 1))
    // advancing through the gap stitches the intervals back together
    assert(Seq(6L, 7L, 8L).foldLeft(s)(_.advance(u1, _)).render == s"$u1:1-9")
    assert(s.advance(u2, 1).contains(u2, 1))
  }

  // model-based properties: a UuidSet is semantically a Set[Long]
  private val genIntervals: Gen[List[(Long, Long)]] =
    Gen.listOfN(4, for {
      a <- Gen.chooseNum(1L, 40L); len <- Gen.chooseNum(0L, 6L)
    } yield (a, a + len))

  private def model(ivs: List[(Long, Long)]): Set[Long] =
    ivs.flatMap { case (a, b) => a to b }.toSet
  private def gtid(ivs: List[(Long, Long)], uuid: String = u1): GtidSet =
    GtidSet(Map(uuid -> UuidSet.normalized(uuid, ivs.map { case (a, b) => Interval(a, b) })))

  test("property: union and containment agree with the Set[Long] model") {
    check(Prop.forAll(genIntervals, genIntervals) { (x, y) =>
      val unionOk = (1L to 50L).forall(t =>
        gtid(x).union(gtid(y)).contains(u1, t) == (model(x) ++ model(y)).contains(t))
      val subsetOk =
        gtid(x).isContainedWithin(gtid(y)) == model(x).subsetOf(model(y))
      unionOk && subsetOk
    })
  }

  test("property: normalization never changes membership and is canonical") {
    check(Prop.forAll(genIntervals) { ivs =>
      val g = gtid(ivs)
      val byMembership = (1L to 50L).forall(t => g.contains(u1, t) == model(ivs).contains(t))
      // canonical: intervals sorted, disjoint, non-adjacent
      val norm = g.sets(u1).intervals
      val canonical = norm.sliding(2).forall {
        case List(a, b) => a.end + 1 < b.start
        case _ => true
      }
      byMembership && canonical
    })
  }

  test("fixRestored: server pre-history kept, server overrun excluded, unknown uuids pass") {
    // server executed 1-100; we restored having consumed 30-60: the restart
    // position keeps the server's history before our window (it predates our
    // subscription) plus our own consumed window — NOT the server's 61-100,
    // which must replay to us
    val server = GtidSet.parse(s"$u1:1-100")
    val restored = GtidSet.parse(s"$u1:30-60")
    assert(GtidSet.fixRestored(server, restored).render == s"$u1:1-60")

    // restored beyond the server (e.g. failover to a stale replica) truncates
    // to what the server actually has
    assert(GtidSet.fixRestored(GtidSet.parse(s"$u1:1-50"), GtidSet.parse(s"$u1:30-80"))
      .render == s"$u1:1-50")

    // a restored uuid the server no longer reports passes through; a server
    // uuid we never consumed stays as the server reports it
    val mixed = GtidSet.fixRestored(
      GtidSet.parse(s"$u1:1-10"), GtidSet.parse(s"$u2:5-8"))
    assert(mixed.render == s"$u1:1-10,$u2:5-8")

    // gaps in the restored set intersect per-interval
    assert(GtidSet.fixRestored(
      GtidSet.parse(s"$u1:1-100"), GtidSet.parse(s"$u1:10-20:40-50"))
      .render == s"$u1:1-20:40-50")
  }

  test("mergeInto never overwrites base uuids") {
    val base = GtidSet.parse(s"$u1:1-10")
    val toMerge = GtidSet.parse(s"$u1:1-999,$u2:1-5")
    assert(GtidSet.mergeInto(base, toMerge).render == s"$u1:1-10,$u2:1-5")
  }

  test("binlog position ordering: GTID first, file/pos fallback, sentinel greatest") {
    import BinlogPosition.ordering
    val small = BinlogPosition(gtidSet = GtidSet.parse(s"$u1:1-5"))
    val big = BinlogPosition(gtidSet = GtidSet.parse(s"$u1:1-9"))
    assert(ordering.lt(small, big) && ordering.gt(big, small))
    // equal sets tie-break on events-to-skip within the transaction
    assert(ordering.lt(small.copy(skipEvents = 1), small.copy(skipEvents = 3)))
    // a GTID-less position is earlier than a GTID-bearing one
    assert(ordering.lt(BinlogPosition(file = "b.9", position = 999), big))
    // no GTIDs anywhere: same server compares (file, pos), case-insensitive
    val f1 = BinlogPosition(file = "mysql-bin.000001", position = 100, serverId = 1)
    val f2 = BinlogPosition(file = "MYSQL-BIN.000002", position = 4, serverId = 1)
    assert(ordering.lt(f1, f2))
    assert(ordering.lt(f1, f1.copy(position = 101)))
    // different servers: binlog coordinates are incomparable, timestamps rule
    val s1 = BinlogPosition(file = "z.9", position = 9, serverId = 1, timestampSec = 10)
    val s2 = BinlogPosition(file = "a.1", position = 1, serverId = 2, timestampSec = 20)
    assert(ordering.lt(s1, s2))
    // the non-stopping sentinel outranks everything
    assert(ordering.lt(big, BinlogPosition.nonStoppingPosition))
    assert(ordering.equiv(BinlogPosition.nonStoppingPosition, BinlogPosition.nonStoppingPosition))
  }

  test("server-id ranges: one id per reader, parallelism bound enforced") {
    assert(ServerIdRange.parse("5400").forSubtask(0) == 5400L)
    val r = ServerIdRange.parse("5400-5404")
    assert(r.size == 5 && r.forSubtask(4) == 5404L)
    val e = intercept[IllegalArgumentException](r.forSubtask(5))
    assert(e.getMessage.contains("parallelism"))
    intercept[IllegalArgumentException](ServerIdRange.parse("5404-5400"))
  }
}
