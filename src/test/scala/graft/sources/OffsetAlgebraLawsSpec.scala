package graft.sources

import graft.sources.sqlserver.CtLsn
import graft.sources.vitess.VGtid
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property laws of the round-9 offset algebras. Every source family's
  * checkpoint correctness reduces to its offset type being a faithful order
  * embedding into the SPI's Long — these laws pin that for all inputs, not
  * the spec examples:
  *  - SQL Server [[CtLsn]]: pack/format/parse round trips; the packed order
  *    equals the lexicographic (vlf, block, slot) order.
  *  - Vitess [[VGtid]]: pack/unpack round trips; within an epoch, the
  *    packed order agrees with vector-clock dominance on comparable pairs;
  *    any single-component increment strictly increases the packed value;
  *    ANY newer-epoch VGtid dominates ANY older-epoch one.
  *  - Oracle LogMiner packing (commitScn << 16 | seq): order equals the
  *    lexicographic (commitScn, seq) order.
  *  - TiKV packing (commitTs << 12 | seq): same law, 12-bit row field.
  */
class OffsetAlgebraLawsSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  private val ctLsnGen: Gen[CtLsn] = for {
    vlf <- Gen.chooseNum(0L, 0x7ffffffL) // one bit under the field: packed stays >= 0
    block <- Gen.chooseNum(0L, 0xffffffL)
    slot <- Gen.chooseNum(0L, 0xfffL)
  } yield CtLsn.of(vlf, block, slot)

  test("CtLsn: parse(asString) round trips and packed order is lexicographic") {
    check(Prop.forAll(ctLsnGen) { l => CtLsn.parse(l.asString) == l && l.value >= 0 })
    check(Prop.forAll(ctLsnGen, ctLsnGen) { (a, b) =>
      val lex = Ordering[(Long, Long, Long)].compare(
        (a.vlf, a.block, a.slot), (b.vlf, b.block, b.slot))
      // the packed order must agree both through CtLsn.compare AND through
      // the SIGNED Long comparison the SPI/runtime actually use
      Integer.signum(a.compare(b)) == Integer.signum(lex) &&
        Integer.signum(java.lang.Long.compare(a.value, b.value)) == Integer.signum(lex)
    })
  }

  private def vgtidGen(nShards: Int, epoch: Int): Gen[VGtid] =
    Gen.listOfN(nShards, Gen.chooseNum(0L, 0xfffL))
      .map(ps => VGtid(ps.toVector, epoch))

  test("VGtid: pack/unpack round trips; packed order = dominance within an epoch") {
    val g = for {
      n <- Gen.chooseNum(2, 4)
      e <- Gen.chooseNum(0, 0xff)
      a <- vgtidGen(n, e)
      b <- vgtidGen(n, e)
    } yield (n, a, b)
    check(Prop.forAll(g) { case (n, a, b) =>
      VGtid.unpack(a.packed, n) == a &&
        // dominance (a <= b component-wise) implies packed order
        (!a.positions.zip(b.positions).forall { case (x, y) => x <= y } ||
          a.packed <= b.packed)
    })
    // single-component increments strictly increase the packed value
    check(Prop.forAll(for {
      n <- Gen.chooseNum(2, 4)
      a <- vgtidGen(n, 0).suchThat(_.positions.forall(_ < 0xfffL))
      i <- Gen.chooseNum(0, n - 1)
    } yield (a, i)) { case (a, i) =>
      VGtid(a.positions.updated(i, a.positions(i) + 1), a.epoch).packed > a.packed
    })
  }

  test("VGtid: a newer epoch dominates every older-epoch position vector") {
    val g = for {
      n <- Gen.chooseNum(2, 4)
      e1 <- Gen.chooseNum(0, 0xfe)
      e2 <- Gen.chooseNum(e1 + 1, 0xff)
      a <- vgtidGen(n, e1)
      b <- vgtidGen(n, e2)
    } yield (a, b)
    check(Prop.forAll(g) { case (older, newer) =>
      newer.packed > older.packed &&
        VGtid.epochOf(newer.packed) > VGtid.epochOf(older.packed)
    })
  }

  test("LogMiner packing: (commitScn << 16 | seq) order is lexicographic") {
    val g = for {
      scn <- Gen.chooseNum(1L, (1L << 46) - 1)
      seq <- Gen.chooseNum(1L, 0xffffL)
    } yield (scn, seq)
    check(Prop.forAll(g, g) { case ((s1, q1), (s2, q2)) =>
      val p1 = (s1 << 16) | q1; val p2 = (s2 << 16) | q2
      Integer.signum(java.lang.Long.compare(p1, p2)) ==
        Integer.signum(Ordering[(Long, Long)].compare((s1, q1), (s2, q2)))
    })
  }

  test("TiKV packing: (commitTs << 12 | seq) order is lexicographic") {
    val g = for {
      ts <- Gen.chooseNum(1L, (1L << 50) - 1)
      seq <- Gen.chooseNum(1L, 0xfffL)
    } yield (ts, seq)
    check(Prop.forAll(g, g) { case ((t1, q1), (t2, q2)) =>
      val p1 = (t1 << 12) | q1; val p2 = (t2 << 12) | q2
      Integer.signum(java.lang.Long.compare(p1, p2)) ==
        Integer.signum(Ordering[(Long, Long)].compare((t1, q1), (t2, q2)))
    })
  }

  test("Db2 AsnSeq packing: (commitSeq << 16 | intentSeq) order is lexicographic") {
    import graft.sources.db2.AsnSeq
    val g = for {
      cs <- Gen.chooseNum(1L, 0x7fffffffffffL)
      is <- Gen.chooseNum(0L, 0xffffL)
    } yield AsnSeq.of(cs, is)
    check(Prop.forAll(g) { a =>
      a.value >= 0 && AsnSeq.of(a.commitSeq, a.intentSeq) == a &&
        a.asString.length == 20
    })
    check(Prop.forAll(g, g) { (a, b) =>
      Integer.signum(a.compare(b)) == Integer.signum(
        Ordering[(Long, Long)].compare(
          (a.commitSeq, a.intentSeq), (b.commitSeq, b.intentSeq)))
    })
  }
}
