package graft.sources.mongo

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class DocumentChangeSourceSpec extends AnyFunSuite {

  private def newSource() = new DocumentChangeSource(
    TableId.parse("app.collection"),
    (0L until 5L).map(i => (i, s"""{"n": $i}""")))

  test("resume tokens: opaque json, decodable to a monotone position") {
    val src = newSource()
    val o1 = src.insertDoc(10L, """{"n": 10}""", tsMillis = 1000L)
    val o2 = src.updateDoc(10L, """{"n": 11}""", tsMillis = 2000L)
    assert(o2 > o1)
    val t1 = src.tokenAt(o1).get
    assert(t1.json.contains("_data")) // the opaque shape
    assert(t1.decodePosition == o1)
    assert(t1.decodeTimestampMillis == 1000L)
    // resumeAfter(token) delivers strictly-later entries only
    val resumed = src.resumeAfter(t1)
    assert(resumed.map(_.offset) == Seq(o2))
  }

  test("update events have no before-image and resolve after by LIVE lookup") {
    val src = newSource()
    val u = src.updateDoc(1L, """{"n": 100}""")
    // a later update to the same document BEFORE the stream reads the first:
    // the lookup returns the newest state (the updateLookup caveat)
    src.updateDoc(1L, """{"n": 200}""")
    val events = src.readLog(u - 1, u).collect {
      case graft.sources.cdc.LogRecord(_, _, e: DataChangeEvent) => e
    }
    assert(events.head.op == OperationType.UPDATE)
    assert(events.head.before == Map("_id" -> 1L)) // key only, no old document
    assert(events.head.after("doc") == """{"n": 200}""") // live, not event-time
  }

  test("update lookup of a since-deleted document yields null, delete is key-only") {
    val src = newSource()
    val u = src.updateDoc(2L, """{"n": 300}""")
    val d = src.deleteDoc(2L)
    val events = src.readLog(u - 1, d).collect {
      case graft.sources.cdc.LogRecord(_, _, e: DataChangeEvent) => e
    }
    assert(events(0).op == OperationType.UPDATE && events(0).after("doc") == null)
    assert(events(1).op == OperationType.DELETE)
    assert(events(1).before == Map("_id" -> 2L)) // documentKey only
    assert(events(1).after.isEmpty)
  }

  test("insert/replace carry the full document at event time") {
    val src = newSource()
    val i = src.insertDoc(20L, """{"n": 1}""")
    src.replaceDoc(20L, """{"n": 2}""")
    val events = src.readLog(i - 1, src.currentOffset).collect {
      case graft.sources.cdc.LogRecord(_, _, e: DataChangeEvent) => e
    }
    // unlike updates, these are NOT lookups: each carries its own document
    assert(events(0).after("doc") == """{"n": 1}""")
    assert(events(1).op == OperationType.REPLACE)
    assert(events(1).after("doc") == """{"n": 2}""")
  }

  test("snapshot + keyStats serve the chunk splitter over the live collection") {
    val src = newSource()
    src.deleteDoc(0L)
    assert(src.keyStats == ((Some(1L), Some(4L), 4L)))
    assert(src.snapshotRead(Some(1L), Some(3L)).map(_("_id")) == Seq(1L, 2L))
    assert(src.offsetAtTimestamp(0L) == 0L)
  }

  test("collection drop: the stream INVALIDATES — resumeAfter dies, startAfter continues") {
    val src = newSource()
    src.updateDoc(1L, """{"n": "pre-drop"}""")
    val preDropTok = src.tokenAt(src.currentOffset).get
    val invalidTok = src.dropCollection()
    // the drop surfaced on the control path as the DropTableEvent family
    assert(src.firstDdlOffset(0L, src.currentOffset).exists(_._2 ==
      Seq(DropTableEvent(TableId.parse("app.collection")))))
    assert(src.keyStats == ((None, None, 0L)), "the collection is gone")
    // post-drop writes implicitly recreate the collection; the oplog goes on
    src.insertDoc(100L, """{"n": "reborn"}""")
    // the OLD stream cannot read across the invalidate position
    val dead = intercept[IllegalArgumentException](src.resumeAfter(preDropTok))
    assert(dead.getMessage.contains("invalidated"))
    // resuming AT the invalidate token is rejected outright (server rule)
    val rejected = intercept[IllegalArgumentException](src.resumeAfter(invalidTok))
    assert(rejected.getMessage.contains("startAfter"))
    // history strictly before the invalidate is still servable
    assert(src.readLog(0L, invalidTok.decodePosition - 2).nonEmpty)
    // a NEW stream with startAfter(invalidate) sees exactly the rebirth
    val cont = src.startAfter(invalidTok)
    assert(cont.map(_.event.asInstanceOf[DataChangeEvent].after("doc")) ==
      Seq("""{"n": "reborn"}"""))
    // the CONTROL-PATH resume: a stream that parked AT the drop position,
    // handled + acked the DropTableEvent, restarts from there — its window
    // starts at the drop offset and must be allowed through
    val (dropAt, _) = src.firstDdlOffset(0L, src.currentOffset).get
    assert(src.readLog(dropAt, src.currentOffset)
      .map(_.event.asInstanceOf[DataChangeEvent].after("doc")) == Seq("""{"n": "reborn"}"""))
    // a second drop of the already-invalidated stream is refused
    intercept[IllegalArgumentException](src.dropCollection())
  }
}
