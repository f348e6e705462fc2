package graft.sources.postgres

import graft.core._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PgOutputSpec extends AnyFunSuite {

  private val tid = TableId.parse("public.users")
  private val schema = TableSchema(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType),
      StructField("score", DoubleType),
      StructField("ok", BooleanType))),
    primaryKeys = Seq("id"))

  private def roundTrip(changes: Seq[DataChangeEvent]): Wal2Json.Tx = {
    val msgs = PgOutput.encodeRelation(4242, schema, tid) +:
      PgOutput.encodeTx(4242, schema, Lsn(0x1000000L), 77L, 1700000000000L, changes)
    val dec = new PgOutput.Decoder
    val txs = dec.feedAll(msgs)
    assert(txs.size == 1)
    txs.head
  }

  test("round trip: typed values, ops, lsn, xid, pg-epoch timestamp") {
    val tx = roundTrip(Seq(
      DataChangeEvent.insert(tid,
        Map("id" -> 1L, "v" -> "a", "score" -> 1.5, "ok" -> true)),
      DataChangeEvent.update(tid,
        Map("id" -> 1L),
        Map("id" -> 1L, "v" -> "b", "score" -> 2.5, "ok" -> false)),
      DataChangeEvent.delete(tid, Map("id" -> 1L))))
    assert(tx.nextLsn.contains(Lsn(0x1000000L)))
    assert(tx.xid == 77L && tx.tsMillis == 1700000000000L)
    val Seq(ins, upd, del) = tx.changes
    assert(ins.op == OperationType.INSERT)
    assert(ins.after == Map("id" -> 1L, "v" -> "a", "score" -> 1.5, "ok" -> true))
    assert(upd.op == OperationType.UPDATE)
    // 'K' old tuple: key columns only, the wal2json oldkeys shape
    assert(upd.before == Map("id" -> 1L))
    assert(upd.after("v") == "b" && upd.after("ok") == false)
    assert(del.op == OperationType.DELETE && del.before == Map("id" -> 1L))
  }

  test("nulls survive in full tuples; key-only tuples carry only keys") {
    val tx = roundTrip(Seq(
      DataChangeEvent.insert(tid,
        Map("id" -> 2L, "v" -> null, "score" -> null, "ok" -> null))))
    assert(tx.changes.head.after ==
      Map("id" -> 2L, "v" -> null, "score" -> null, "ok" -> null))
  }

  test("relation state persists across transactions; unknown relid errors") {
    val dec = new PgOutput.Decoder
    dec.feedAll(PgOutput.encodeRelation(7, schema, tid) +:
      PgOutput.encodeTx(7, schema, Lsn(100L), 1L, 0L,
        Seq(DataChangeEvent.insert(tid, Map("id" -> 1L)))))
    // second tx WITHOUT a fresh Relation message still decodes
    val txs = dec.feedAll(PgOutput.encodeTx(7, schema, Lsn(200L), 2L, 0L,
      Seq(DataChangeEvent.insert(tid, Map("id" -> 2L)))))
    assert(txs.size == 1 && txs.head.changes.head.after("id") == 2L)
    // a fresh decoder (a restart that never replayed Relation) fails loudly
    val fresh = new PgOutput.Decoder
    val ex = intercept[IllegalArgumentException] {
      fresh.feedAll(PgOutput.encodeTx(7, schema, Lsn(300L), 3L, 0L,
        Seq(DataChangeEvent.insert(tid, Map("id" -> 3L)))))
    }
    assert(ex.getMessage.contains("unknown relation"))
  }

  test("protocol guards: Begin-in-Begin, Commit-without-Begin, stray data, bad tag") {
    val dec = new PgOutput.Decoder
    val msgs = PgOutput.encodeRelation(9, schema, tid) +:
      PgOutput.encodeTx(9, schema, Lsn(10L), 1L, 0L,
        Seq(DataChangeEvent.insert(tid, Map("id" -> 1L))))
    val Seq(rel, begin, insert, commit) = msgs
    dec.feed(rel)
    intercept[IllegalArgumentException] { dec.feed(commit) } // commit w/o begin
    intercept[IllegalArgumentException] { dec.feed(insert) } // data outside tx
    dec.feed(begin)
    intercept[IllegalArgumentException] { dec.feed(begin) } // begin inside tx
    intercept[IllegalArgumentException] {
      dec.feed(Array[Byte]('Z'.toByte)) // unknown message type
    }
  }

  test("Truncate rides the tx as ddl; Origin/Type/Message skip; unknown still loud") {
    val dec = new PgOutput.Decoder
    val frames = Seq(
      PgOutput.encodeRelation(21, schema, tid),
      // benign frames a real replication setup emits — previously fatal
      PgOutput.encodeOrigin(Lsn(5L), "upstream_a"),
      PgOutput.encodeType(600001, "public", "custom_enum"),
      PgOutput.encodeMessage(transactional = false, Lsn(6L), "pfx", Array[Byte](9))) ++
      PgOutput.encodeTruncateTx(21, Lsn(700L), 42L, 0L) ++
      PgOutput.encodeTx(21, schema, Lsn(800L), 43L, 0L,
        Seq(DataChangeEvent.insert(tid, Map("id" -> 7L))))
    val txs = dec.feedAll(frames)
    assert(txs.size == 2)
    assert(txs(0).ddl == Seq(TruncateTableEvent(tid)) && txs(0).changes.isEmpty)
    assert(txs(1).ddl.isEmpty && txs(1).changes.head.after("id") == 7L)
    // truncate of an unknown relid is NOT benign — Relation must be shipped
    val fresh = new PgOutput.Decoder
    val ex = intercept[IllegalArgumentException] {
      fresh.feedAll(PgOutput.encodeTruncateTx(99, Lsn(900L), 44L, 0L))
    }
    assert(ex.getMessage.contains("unknown relation"))
    // truncate outside a transaction is a protocol violation
    intercept[IllegalArgumentException] {
      dec.feed(PgOutput.encodeTruncate(Seq(21)))
    }
    // genuinely unknown frames still fail loudly
    intercept[IllegalArgumentException] { dec.feed(Array[Byte]('Q'.toByte)) }
  }

  test("unchanged-toast columns ('u') are absent, not null") {
    // hand-build an Insert whose 'v' column is an unchanged toast datum
    val dec = new PgOutput.Decoder
    dec.feed(PgOutput.encodeRelation(11, schema, tid))
    val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put('B'.toByte); b.putLong(50L); b.putLong(0L); b.putInt(5)
    val begin = java.util.Arrays.copyOf(b.array(), b.position())
    val t = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.BIG_ENDIAN)
    t.put('I'.toByte); t.putInt(11); t.put('N'.toByte)
    t.putShort(4)
    t.put('t'.toByte); t.putInt(1); t.put("3".getBytes) // id = 3
    t.put('u'.toByte) // v: unchanged toast
    t.put('n'.toByte) // score: null
    t.put('t'.toByte); t.putInt(1); t.put("t".getBytes) // ok = true
    val ins = java.util.Arrays.copyOf(t.array(), t.position())
    val c = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.BIG_ENDIAN)
    c.put('C'.toByte); c.put(0.toByte); c.putLong(50L); c.putLong(50L); c.putLong(0L)
    val commit = java.util.Arrays.copyOf(c.array(), c.position())
    val txs = new scala.collection.mutable.ArrayBuffer[Wal2Json.Tx]
    Seq(begin, ins, commit).foreach(m => dec.feed(m).foreach(txs += _))
    val after = txs.head.changes.head.after
    assert(after == Map("id" -> 3L, "score" -> null, "ok" -> true))
    assert(!after.contains("v")) // not sent ≠ null
  }
}
