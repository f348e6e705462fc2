package graft.sources.mongo

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** The OP_MSG change-stream double at the wire level: BSON round trips,
  * hello/aggregate/getMore parity with the in-process oplog read, resume
  * tokens across sessions, the resumeAfter-invalidate refusal as a real
  * `ok:0` server error, and the drop → invalidate → cursor-0 closure. */
class MongoWireSpec extends AnyFunSuite {
  import Bson._

  private val tid = TableId.parse("appdb.items")

  private def newDouble(batchSize: Int = 32) = {
    val src = new DocumentChangeSource(tid,
      (0L until 5L).map(i => (i, s"""{"v": $i}""")))
    val d = new MongoServerDouble(src, batchSize)
    d.start()
    d
  }

  test("bson: encode/decode round trip preserves order and types") {
    val doc = BDoc(Seq(
      "hello" -> 1, "big" -> 7L, "pi" -> 3.5, "s" -> "txt",
      "t" -> true, "f" -> false, "n" -> null,
      "sub" -> BDoc(Seq("a" -> 1)), "arr" -> Seq(1, "two", 3L),
      "ts" -> BTs(1700000000, 2)))
    val back = Bson.decode(Bson.encode(doc))
    assert(back == doc)
    assert(back.fields.map(_._1) == doc.fields.map(_._1), "field order must survive")
  }

  test("full stream over the socket equals the in-process read") {
    val d = newDouble()
    try {
      val src = d.source
      src.insertDoc(100L, """{"v": 100}""")
      src.updateDoc(3L, """{"v": 33}""")
      src.deleteDoc(1L)
      val wire = MongoChangeStreamClient.dump(
        "127.0.0.1", d.port, "appdb", "items", resumeAfter = None)
      assert(wire.map(_.opType) == Seq("insert", "update", "delete"))
      assert(wire.map(_.id) == Seq(Some(100L), Some(3L), Some(1L)))
      // the update was resolved UPDATE_LOOKUP-style on the server
      assert(wire(1).fullDocument.contains("""{"v": 33}"""))
      val inProc = src.readLog(0L, src.currentOffset)
      assert(wire.map(e => ResumeToken(s"""{"_data": "${e.tokenHex}"}""").decodePosition)
        == inProc.map(_.offset))
    } finally d.stop()
  }

  test("resumeAfter a mid-stream token serves only the suffix; getMore pages") {
    val d = newDouble(batchSize = 2) // force getMore paging
    try {
      val src = d.source
      (200L until 210L).foreach(i => src.insertDoc(i, s"""{"v": $i}"""))
      val all = MongoChangeStreamClient.dump(
        "127.0.0.1", d.port, "appdb", "items", resumeAfter = None)
      assert(all.size == 10, "paged cursor must drain everything")
      val after3 = MongoChangeStreamClient.dump(
        "127.0.0.1", d.port, "appdb", "items", resumeAfter = Some(all(2).tokenHex))
      assert(after3.map(_.id.get) == (203L until 210L).toSeq)
    } finally d.stop()
  }

  test("resumeAfter the invalidate token is refused; startAfter continues") {
    val d = newDouble()
    try {
      val src = d.source
      src.insertDoc(300L, """{"v": 300}""")
      val tok = src.dropCollection()
      src.insertDoc(301L, """{"v": 301}""") // implicit recreate, post-drop
      val hex = { val j = tok.json; val i = j.indexOf("\"_data\": \"") + 10
        j.substring(i, j.indexOf('"', i)) }
      val e = intercept[IllegalStateException] {
        MongoChangeStreamClient.dump(
          "127.0.0.1", d.port, "appdb", "items", resumeAfter = Some(hex))
      }
      assert(e.getMessage.contains("ChangeStreamHistoryLost"), e.getMessage)
      val continued = MongoChangeStreamClient.dump(
        "127.0.0.1", d.port, "appdb", "items", resumeAfter = None, startAfter = Some(hex))
      assert(continued.map(_.id) == Seq(Some(301L)))
    } finally d.stop()
  }

  test("a stream crossing the drop delivers drop + invalidate, then closes") {
    val d = newDouble()
    try {
      val src = d.source
      src.insertDoc(400L, """{"v": 400}""")
      src.dropCollection()
      src.insertDoc(401L, """{"v": 401}""") // after the invalidate: a NEW stream's event
      val wire = MongoChangeStreamClient.dump(
        "127.0.0.1", d.port, "appdb", "items", resumeAfter = None)
      assert(wire.map(_.opType) == Seq("insert", "drop", "invalidate"),
        "the dying stream must END at invalidate — post-drop writes belong to startAfter")
    } finally d.stop()
  }

  test("socket source resumes PAST a drop: post-recreate events survive") {
    // the silent-data-loss shape: drop + implicit recreate, then a window
    // entirely after the drop. An exact-token resume lookup misses the
    // control positions, replays from 0, and the server closes the cursor
    // at the invalidate — every post-recreate record vanished. The socket
    // source must open the startAfter SUCCESSOR stream instead.
    val d = newDouble()
    try {
      val src = d.source
      val dropOff = {
        val tok = src.dropCollection()
        tok.decodePosition - 1 // the drop position (invalidate is +1)
      }
      src.insertDoc(100L, """{"v": 100}""")
      src.insertDoc(101L, """{"v": 101}""")
      val sock = new MongoSocketChangeSource(d)
      val got = sock.readLog(dropOff, src.currentOffset)
      assert(got.size == 2,
        s"post-recreate events must survive the drop, got $got")
      assert(got.map(_.event.asInstanceOf[DataChangeEvent].after("_id"))
        == Seq(100L, 101L))
      assert(got == src.readLog(dropOff, src.currentOffset),
        "socket and in-process reads agree across the drop")
      // a window crossing the invalidate from under the drop refuses
      // loudly, matching the in-process source
      val e = intercept[IllegalArgumentException](
        sock.readLog(0L, src.currentOffset))
      assert(e.getMessage.contains("invalidated"))
    } finally d.stop()
  }

  test("socket records carry exact event millis (wallTime), not truncated seconds") {
    val d = newDouble()
    try {
      d.source.insertDoc(50L, """{"v": 50}""", tsMillis = 1700000000500L)
      val sock = new MongoSocketChangeSource(d)
      val recs = sock.readLog(0L, d.source.currentOffset)
      assert(recs.nonEmpty && recs.last.tsMillis == 1700000000500L,
        s"clusterTime truncates to seconds; wallTime must carry the millis: $recs")
    } finally d.stop()
  }

  test("unknown collection and bad cursor are wire errors") {
    val d = newDouble()
    try {
      val e1 = intercept[IllegalStateException] {
        MongoChangeStreamClient.dump("127.0.0.1", d.port, "appdb", "nope", None)
      }
      assert(e1.getMessage.contains("NamespaceNotFound"))
    } finally d.stop()
  }
}
