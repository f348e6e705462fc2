package graft.core

import graft.core.CdcTypes._
import graft.operators.ChunkSplitter
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (raw ScalaCheck driven from ScalaTest) of the two
  * pure algorithms whose invariants carry the correctness of everything above
  * them: the type-widening lattice (`SchemaMergingUtils.getLeastCommonType`
  * semantics) and the chunk splitter (every key covered exactly once by
  * half-open ranges).
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  private val scalarTypes: Gen[CdcType] = Gen.oneOf(
    BooleanT(), TinyIntT(), SmallIntT(), IntT(), BigIntT(), FloatT(), DoubleT(),
    DecimalT(10, 2), DecimalT(20, 0), CharT(8), VarCharT(32), StringT(),
    DateT(), TimestampT(6), LocalZonedTimestampT(6), ZonedTimestampT(6))

  test("widening lattice: commutative") {
    check(Prop.forAll(scalarTypes, scalarTypes) { (a, b) =>
      SchemaMerging.leastCommonType(a, b) == SchemaMerging.leastCommonType(b, a)
    })
  }

  test("widening lattice: idempotent and absorbing upward") {
    check(Prop.forAll(scalarTypes, scalarTypes) { (a, b) =>
      val ab = SchemaMerging.leastCommonType(a, b)
      SchemaMerging.leastCommonType(a, a) == a &&
      // the merged type absorbs both inputs (least upper bound)
      SchemaMerging.leastCommonType(ab, a) == ab &&
      SchemaMerging.leastCommonType(ab, b) == ab
    })
  }

  test("widening lattice: associative") {
    check(Prop.forAll(scalarTypes, scalarTypes, scalarTypes) { (a, b, c) =>
      val left = SchemaMerging.leastCommonType(SchemaMerging.leastCommonType(a, b), c)
      val right = SchemaMerging.leastCommonType(a, SchemaMerging.leastCommonType(b, c))
      left == right
    })
  }

  test("chunk splitter: half-open ranges tile the key space exactly once") {
    val gen = for {
      min <- Gen.chooseNum(-1000L, 1000L)
      span <- Gen.chooseNum(1L, 100000L)
      cnt <- Gen.chooseNum(1L, 50000L)
      chunkSize <- Gen.chooseNum(10, 5000)
    } yield (min, min + span, cnt, chunkSize)

    check(Prop.forAll(gen) { case (mn, mx, cnt, chunkSize) =>
      val probe = new ChunkSplitter.Probe {
        // dense-key probe consistent with [mn, mx]
        def nextChunkMax(from: Long, c: Int): Option[Long] = {
          val hi = math.min(from + c, mx)
          if (from >= mx) None else Some(hi)
        }
        def minAfter(v: Long): Option[Long] = if (v >= mx) None else Some(v + 1)
      }
      val chunks = ChunkSplitter.generateSplits(
        Some(mn), Some(mx), cnt, ChunkSplitter.Config(chunkSize = chunkSize), probe)

      val open = chunks.nonEmpty && chunks.head.start.isEmpty && chunks.last.end.isEmpty
      val contiguous = chunks.sliding(2).forall {
        case Seq(a, b) => a.end.isDefined && a.end == b.start
        case _ => true
      }
      // every sampled key in [mn, mx] falls in EXACTLY one half-open range
      val sample = (Seq(mn, mx, (mn + mx) / 2) ++
        chunks.flatMap(c => c.end.toSeq.flatMap(e => Seq(e - 1, e))))
        .filter(k => k >= mn && k <= mx).distinct
      val tiling = sample.forall { k =>
        chunks.count(c => c.start.forall(k >= _) && c.end.forall(k < _)) == 1
      }
      open && contiguous && tiling
    }, tests = 200)
  }
}
