package graft.sources

import graft.sources.mongo.Bson
import graft.sources.mongo.Bson.{BDoc, BTs}
import graft.sources.postgres.{Lsn, PgWireV3}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Property laws for the round-9 wire codecs: every message a socket double
  * writes must decode back to itself FOR ALL inputs — a codec that round
  * trips only the spec's examples is one odd string away from a hung or
  * corrupted replication session.
  *  - BSON subset: arbitrary nested documents (all supported types,
  *    arbitrary field names) encode/decode to the identical ordered tree.
  *  - OP_MSG framing: any body round trips with its request id.
  *  - PG v3 framing: any (type, body) round trips; the startup message
  *    round trips its parameter map; XLogData/keepalive/standby-status
  *    payload fields survive.
  *  - Truncated BSON fails loudly, never returns a wrong document.
  */
class WireCodecLawsSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  // field names: non-empty, no NUL (BSON cstrings cannot carry NUL)
  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(16))
  private val strGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '"', '\\', 'ü', '中')))
      .map(_.mkString)

  private def valueGen(depth: Int): Gen[Any] = {
    val scalars = Seq(
      Gen.chooseNum(Int.MinValue, Int.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(-1e12, 1e12), // doubles: exclude NaN (NaN != NaN breaks ==)
      strGen,
      Gen.oneOf(true, false),
      Gen.const(null),
      for { s <- Gen.chooseNum(0, Int.MaxValue); i <- Gen.chooseNum(0, Int.MaxValue) }
        yield BTs(s, i))
    val leaf = Gen.oneOf(scalars(0), scalars(1), scalars(2), scalars(3),
      scalars(4), scalars(5), scalars(6))
    if (depth <= 0) leaf
    else Gen.frequency(
      6 -> leaf,
      1 -> Gen.lzy(docGen(depth - 1)),
      1 -> Gen.lzy(Gen.listOfN(3, valueGen(depth - 1)).map(_.toSeq)))
  }

  private def docGen(depth: Int): Gen[BDoc] =
    Gen.listOfN(4, for { n <- nameGen; v <- valueGen(depth) } yield (n, v))
      .map(fs => BDoc(fs.toSeq))

  test("bson: arbitrary nested documents round trip, order preserved") {
    check(Prop.forAll(docGen(3)) { doc =>
      Bson.decode(Bson.encode(doc)) == doc
    }, tests = 300)
  }

  test("bson: truncation fails loudly, never decodes to a wrong document") {
    check(Prop.forAll(docGen(2)) { doc =>
      val bytes = Bson.encode(doc)
      (1 until bytes.length).forall { n =>
        try { Bson.decode(bytes.take(n)); false } // a silent success is the bug
        catch { case _: Throwable => true }
      }
    }, tests = 50)
  }

  test("op_msg: any body round trips with its request id") {
    import graft.sources.mongo.OpMsg
    check(Prop.forAll(docGen(2), Gen.chooseNum(0, Int.MaxValue)) { (doc, reqId) =>
      val out = new ByteArrayOutputStream()
      OpMsg.write(out, reqId, 0, doc)
      val (gotId, gotDoc) = OpMsg.read(new ByteArrayInputStream(out.toByteArray))
      gotId == reqId && gotDoc == doc
    })
  }

  test("pg v3: typed messages round trip") {
    check(Prop.forAll(
      Gen.oneOf('d', 'E', 'W', 'Z', 'C', 'R'),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { (tpe, body) =>
      val out = new ByteArrayOutputStream()
      PgWireV3.writeMsg(out, tpe, body)
      val (gotT, gotB) = PgWireV3.readMsg(new ByteArrayInputStream(out.toByteArray))
      gotT == tpe && gotB.sameElements(body)
    })
  }

  test("pg v3: startup message round trips its parameters") {
    val kvGen = for {
      k <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
      v <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
    } yield (k, v)
    check(Prop.forAll(Gen.nonEmptyListOf(kvGen).map(_.distinctBy(_._1).take(5))) { params =>
      val out = new ByteArrayOutputStream()
      PgWireV3.writeStartup(out, params)
      PgWireV3.readStartup(new ByteArrayInputStream(out.toByteArray)) == params.toMap
    })
  }

  test("pg v3: XLogData / keepalive / standby-status fields survive framing") {
    val lsnGen = Gen.chooseNum(1L, Long.MaxValue).map(Lsn(_))
    check(Prop.forAll(lsnGen, lsnGen,
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) {
      (start, end, payload) =>
        val x = PgWireV3.encodeXLogData(start, end, 7L, payload)
        val b = java.nio.ByteBuffer.wrap(x)
        b.get() == 'w'.toByte && b.getLong() == start.value && b.getLong() == end.value &&
          b.getLong() == 7L && {
            val rest = new Array[Byte](b.remaining()); b.get(rest); rest.sameElements(payload)
          } && {
            val k = java.nio.ByteBuffer.wrap(PgWireV3.encodeKeepalive(end, 3L, true))
            k.get() == 'k'.toByte && k.getLong() == end.value && k.getLong() == 3L &&
              k.get() == 1.toByte
          } && {
            val r = java.nio.ByteBuffer.wrap(
              PgWireV3.encodeStandbyStatus(start, end, end, 5L))
            r.get() == 'r'.toByte && r.getLong() == start.value &&
              r.getLong() == end.value && r.getLong() == end.value && r.getLong() == 5L
          }
    }, tests = 100)
  }
}
