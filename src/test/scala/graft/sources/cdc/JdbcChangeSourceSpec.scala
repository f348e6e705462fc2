package graft.sources.cdc

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 incremental-snapshot source running against a REAL database
  * engine (embedded Derby) through the JDBC dialect of [[ChangeSource]] —
  * chunked snapshot, LW/HW backfill, log tailing, HW suppression, all against
  * SQL state instead of in-memory maps.
  */
class JdbcChangeSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def schema = {
    import org.apache.spark.sql.types._
    TableSchema(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType))),
      primaryKeys = Seq("id"))
  }

  private def newSource(name: String): JdbcChangeSource = {
    val db = java.nio.file.Files.createTempDirectory(s"derby-$name").resolve("db")
    val src = new JdbcChangeSource(s"jdbc:derby:$db;create=true", TableId.parse(s"db.$name"),
      schema)
    src.initTables()
    src
  }

  private def row(id: Long, v: String): Map[String, Any] = Map("id" -> id, "v" -> v)

  test("snapshot + log phases against Derby: state equals SQL table") {
    val t = TableId.parse("db.jdbct")
    val src = newSource("jdbct")
    (1L to 50L).foreach(i => src.applyEvent(DataChangeEvent.insert(t, row(i, s"v$i"))))
    src.applyEvent(DataChangeEvent.update(t, row(7L, "v7"), row(7L, "x")))
    src.applyEvent(DataChangeEvent.delete(t, row(8L, "v8")))
    val id = "jdbc-e2e"
    ChangeSourceRegistry.register(id, src)

    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = spark.readStream.format(classOf[GraftCdcProvider].getName)
      .option("sourceId", id).option("chunk.size", "16")
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) => buf ++= b.collect(); () }
      .start()
    q.processAllAvailable()
    // post-snapshot log events tail through
    src.applyEvent(DataChangeEvent.update(t, row(1L, "v1"), row(1L, "one")))
    src.applyEvent(DataChangeEvent.insert(t, row(99L, "ninetynine")))
    q.processAllAvailable()
    q.stop()

    val state = buf.groupBy { r =>
      val a = r.getStruct(3); val b = r.getStruct(2)
      if (a != null) a.getLong(0) else b.getLong(0)
    }.map { case (k, rows) => k -> rows.maxBy(_.getLong(4)) }
      .collect { case (k, r) if r.getString(1) != "DELETE" => k -> r.getStruct(3).getString(1) }
    val expected = src.snapshotRead(None, None)
      .map(r => r("id").toString.toLong -> r("v").toString).toMap
    assert(state == expected)
    assert(state(7L) == "x" && state(1L) == "one" && state(99L) == "ninetynine")
    assert(!state.contains(8L))
    ChangeSourceRegistry.remove(id)
  }

  test("log ranges, key stats, and timestamp offsets read back from SQL") {
    val t = TableId.parse("db.jdbclog")
    val src = newSource("jdbclog")
    src.applyEvent(DataChangeEvent.insert(t, row(1L, "a")), tsMillis = 1000)
    src.applyEvent(DataChangeEvent.update(t, row(1L, "a"), row(1L, "b")), tsMillis = 2000)
    src.applyEvent(DataChangeEvent.delete(t, row(1L, "b")), tsMillis = 3000)

    assert(src.currentOffset == 3)
    assert(src.keyStats == (None, None, 0L)) // deleted: table empty
    val recs = src.readLog(0, 3)
    assert(recs.map(_.offset) == Seq(1L, 2L, 3L))
    assert(recs(1).event.asInstanceOf[DataChangeEvent].before == row(1L, "a"))
    assert(recs(1).event.asInstanceOf[DataChangeEvent].after == row(1L, "b"))
    assert(recs(2).event.asInstanceOf[DataChangeEvent].after == Map.empty)
    assert(src.readLog(1, 2).map(_.offset) == Seq(2L))
    assert(src.offsetAtTimestamp(2000) == 1)
    assert(src.offsetAtTimestamp(9999) == 3)
  }

  test("startup modes against Derby: snapshot bounded, latest skips, timestamp seeks") {
    val t = TableId.parse("db.jdbcmodes")
    val src = newSource("jdbcmodes")
    src.applyEvent(DataChangeEvent.insert(t, row(1L, "a")), tsMillis = 1000)
    src.applyEvent(DataChangeEvent.update(t, row(1L, "a"), row(1L, "b")), tsMillis = 2000)
    val id = "jdbc-modes"
    ChangeSourceRegistry.register(id, src)
    try {
      def run(opts: Map[String, String]): Seq[org.apache.spark.sql.Row] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        var reader = spark.readStream.format(classOf[GraftCdcProvider].getName)
          .option("sourceId", id)
        opts.foreach { case (k, v) => reader = reader.option(k, v) }
        val q = reader.load().writeStream
          .foreachBatch { (b: DataFrame, _: Long) => buf ++= b.collect(); () }
          .start()
        q.processAllAvailable(); q.stop()
        buf.toSeq
      }
      // snapshot: bounded, current state only (1 row, post-update value)
      val snap = run(Map("startup.mode" -> "snapshot"))
      assert(snap.size == 1 && snap.head.getStruct(3).getString(1) == "b")
      // latest: history skipped, nothing emitted
      assert(run(Map("startup.mode" -> "latest")).isEmpty)
      // earliest: full history replayed as events
      val earliest = run(Map("startup.mode" -> "earliest"))
      assert(earliest.map(_.getString(1)) == Seq("INSERT", "UPDATE"))
      // timestamp: seek to the first offset at/after ts=2000
      val fromTs = run(Map("startup.mode" -> "timestamp", "startup.timestamp" -> "2000"))
      assert(fromTs.map(_.getString(1)) == Seq("UPDATE"))
    } finally ChangeSourceRegistry.remove(id)
  }

  test("PK-changing UPDATE deletes the old key in the SQL table") {
    val t = TableId.parse("db.jdbcpk")
    val src = newSource("jdbcpk")
    src.applyEvent(DataChangeEvent.insert(t, row(1L, "a")))
    src.applyEvent(DataChangeEvent.update(t, row(1L, "a"), row(9L, "a-moved")))
    assert(src.snapshotRead(None, None).map(_("id")) == Seq(9L))
  }
}
