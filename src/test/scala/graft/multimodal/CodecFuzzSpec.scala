package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzzed-truncation contract for the media codecs: a corrupt payload must
  * always surface as `IllegalArgumentException` with a decode message — never
  * a `BufferUnderflowException`, `NegativeArraySizeException`,
  * `ArrayIndexOutOfBoundsException`, or a raw `EOFException` escaping from
  * parser internals. Untrusted 100 TB corpora contain every possible
  * truncation; an executor dying on a buffer fault (instead of a catchable
  * decode error a dead-letter filter can route) would fail the whole stage.
  *
  * The prefix check is EXHAUSTIVE — every strict prefix of a valid payload —
  * not sampled: off-by-one guards live at specific boundaries (chunk headers,
  * length fields) that random sampling can miss.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  /** Runs the decoder; fails the suite on any throwable other than IAE. */
  private def decodeOutcome(decode: => Any): Either[IllegalArgumentException, Any] =
    try Right(decode)
    catch {
      case e: IllegalArgumentException => Left(e)
      case other: Throwable =>
        fail(s"decoder escaped with ${other.getClass.getName}: ${other.getMessage}")
    }

  private val wav = MediaCodecs.encodeWav(
    Array.tabulate[Short](600)(t => (math.sin(t * 0.07) * 12000).toShort), 8000)
  private val gvid = MediaCodecs.encodeGvid(
    Seq(Array.tabulate[Byte](200)(j => (j * 7).toByte)), 1000)
  private val png = MediaCodecs.encodePng(
    16, 12, Array.tabulate(16 * 12)(p => (p * 2654435761L).toInt & 0xffffff))

  test("every strict prefix of a valid WAV raises IllegalArgumentException") {
    (0 until wav.length).foreach { n =>
      val out = decodeOutcome(MediaCodecs.decodeWav(wav.take(n)))
      assert(out.isLeft, s"prefix of $n/${wav.length} bytes decoded successfully")
    }
  }

  test("every strict prefix of a single-frame GVID raises IllegalArgumentException") {
    (0 until gvid.length).foreach { n =>
      val pre = gvid.take(n)
      assert(decodeOutcome(MediaCodecs.gvidFrame(pre, 0)).isLeft,
        s"gvidFrame on a $n/${gvid.length}-byte prefix decoded successfully")
      // gvidInfo reads only the header, so prefixes holding the full 12-byte
      // header legitimately succeed — the contract is only "never a buffer
      // fault", enforced by decodeOutcome
      decodeOutcome(MediaCodecs.gvidInfo(pre))
    }
  }

  test("every strict prefix of a valid PNG decodes or raises IllegalArgumentException") {
    // ImageIO may tolerate a missing trailing chunk, so success is allowed;
    // what is forbidden is any non-IAE escape (EOFException, IIOException, …)
    (0 until png.length).foreach(n => decodeOutcome(MediaCodecs.decodePng(png.take(n))))
  }

  test("random byte garbage never escapes the IAE contract (all codecs)") {
    val bytesGen = Gen.chooseNum(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    check(Prop.forAll(bytesGen) { bs =>
      decodeOutcome(MediaCodecs.decodeWav(bs))
      decodeOutcome(MediaCodecs.gvidInfo(bs))
      decodeOutcome(MediaCodecs.gvidFrame(bs, 0))
      decodeOutcome(MediaCodecs.decodePng(bs))
      true
    })
  }

  test("bit flips in a valid payload never escape the IAE contract") {
    val posGen = for {
      which <- Gen.oneOf(0, 1, 2)
      payload = which match { case 0 => wav; case 1 => gvid; case _ => png }
      pos <- Gen.chooseNum(0, payload.length - 1)
      bit <- Gen.chooseNum(0, 7)
    } yield (which, payload, pos, bit)
    check(Prop.forAll(posGen) { case (which, payload, pos, bit) =>
      val mutated = payload.clone()
      mutated(pos) = (mutated(pos) ^ (1 << bit)).toByte
      which match {
        case 0 => decodeOutcome(MediaCodecs.decodeWav(mutated))
        case 1 => decodeOutcome(MediaCodecs.gvidFrame(mutated, 0))
        case _ => decodeOutcome(MediaCodecs.decodePng(mutated))
      }
      true
    })
  }
}
