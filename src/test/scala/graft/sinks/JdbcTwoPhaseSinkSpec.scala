package graft.sinks

import graft.SparkTestBase
import graft.core._
import graft.sources.mysql.MySqlDdlParser
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once guarantees of the staging-table 2PC JDBC sink, proven by
  * crash injection against embedded Derby: a crash at EVERY protocol seam
  * (after prepare; inside promote before commit) followed by a full batch
  * replay must yield exactly-once results — on an APPEND-ONLY target, where
  * PK-upsert idempotence cannot mask a double apply.
  */
class JdbcTwoPhaseSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshDb(): String = s"memory:graft2pc${System.nanoTime()};create=true"

  private def query(db: String, sql: String): Seq[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db")
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = Seq.newBuilder[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.result()
    } finally conn.close()
  }

  private val usersDdl =
    "CREATE TABLE app.users (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(64), score INT)"
  // no primary key: a ledger, the non-idempotent shape
  private val ledgerSchema = TableSchema(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("txn", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.IntegerType))),
    primaryKeys = Seq.empty)

  test("merge mode: upsert, delete, evolve round trip (single MERGE promote)") {
    val db = freshDb()
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db")
    val t = TableId.of("app", "users")
    MySqlDdlParser.parse(usersDdl).foreach(sink.applySchemaChange)
    sink.writeBatch(t,
      Seq((1L, "ann", 10), (2L, "bob", 20)).toDF("id", "name", "score"),
      Seq.empty[Long].toDF("id"), batchId = 0L, runId = "r1")
    sink.writeBatch(t,
      Seq((1L, "ann2", 11), (3L, "cid", 30)).toDF("id", "name", "score"),
      Seq(2L).toDF("id"), batchId = 1L, runId = "r1")
    assert(query(db, "SELECT id, name FROM app_users ORDER BY id")
      .map(r => (r(0), r(1))) == Seq((1L, "ann2"), (3L, "cid")))
    // staging is drained after a successful promote
    assert(query(db, "SELECT count(*) FROM app_users_STAGE").head.head == 0)
    // schema evolution reaches BOTH physical tables
    MySqlDdlParser.parse("ALTER TABLE app.users ADD COLUMN tier VARCHAR(8)")
      .foreach(sink.applySchemaChange)
    sink.writeBatch(t,
      Seq((4L, "dee", 40, "gold")).toDF("id", "name", "score", "tier"),
      Seq.empty[Long].toDF("id"), batchId = 2L, runId = "r1")
    assert(query(db, "SELECT tier FROM app_users WHERE id = 4").head.head == "gold")
  }

  test("append-only target: replayed batch is skipped wholesale (no double rows)") {
    val db = freshDb()
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true)
    val t = TableId.of("app", "ledger")
    sink.applySchemaChange(CreateTableEvent(t, ledgerSchema))
    val batch = Seq((1L, 100), (2L, 200)).toDF("txn", "amount")
    sink.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 0L, runId = "r1")
    // the streaming runner re-delivers the last batch after restart
    sink.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 0L, runId = "r1")
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 2)
  }

  test("crash after prepare: target untouched; replay applies exactly once") {
    val db = freshDb()
    val crashing = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true) {
      override protected def onPrepared(): Unit = throw new RuntimeException("boom")
    }
    val t = TableId.of("app", "ledger")
    crashing.applySchemaChange(CreateTableEvent(t, ledgerSchema))
    val batch = Seq((1L, 100), (2L, 200)).toDF("txn", "amount")
    intercept[RuntimeException] {
      crashing.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 0L, runId = "r1")
    }
    // staged but never promoted: target empty, commit record absent
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 0)
    assert(query(db, "SELECT count(*) FROM app_ledger_STAGE").head.head == 2)
    // fresh sink instance (the restarted job) replays the same batch
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true)
    sink.applySchemaChange(CreateTableEvent(t, ledgerSchema)) // idempotent create attempt
    sink.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 0L, runId = "r1")
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 2)
    assert(query(db, "SELECT count(*) FROM app_ledger_STAGE").head.head == 0)
  }

  test("crash inside promote before commit: transaction rolls back atomically") {
    val db = freshDb()
    val crashing = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true) {
      override protected def beforeCommit(conn: java.sql.Connection): Unit =
        throw new RuntimeException("power cut")
    }
    val t = TableId.of("app", "ledger")
    crashing.applySchemaChange(CreateTableEvent(t, ledgerSchema))
    val batch = Seq((1L, 100), (2L, 200), (3L, 300)).toDF("txn", "amount")
    intercept[RuntimeException] {
      crashing.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 5L, runId = "r1")
    }
    // the WHOLE promote rolled back: no target rows, no commit record, and the
    // staged rows are still there (their delete was part of the transaction)
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 0)
    assert(query(db, "SELECT count(*) FROM GRAFT_COMMITS").head.head == 0)
    assert(query(db, "SELECT count(*) FROM app_ledger_STAGE").head.head == 3)
    // replay completes the batch exactly once
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true)
    sink.applySchemaChange(CreateTableEvent(t, ledgerSchema))
    sink.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 5L, runId = "r1")
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 3)
    assert(query(db, "SELECT BATCH_ID FROM GRAFT_COMMITS").head.head == 5L)
    // and a second replay after the durable commit is a no-op
    sink.writeBatch(t, batch, Seq.empty[Long].toDF("txn"), batchId = 5L, runId = "r1")
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 3)
  }

  test("executor staging failure surfaces the original error, not close()'s refusal") {
    // a failed batch insert leaves an open transaction; Derby refuses
    // close() mid-transaction, and without the rollback-in-finally that
    // close() SQLException would MASK the real failure — the task error must
    // carry the truncation, not 'invalid transaction state'
    val db = freshDb()
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db")
    val t = TableId.of("app", "users")
    MySqlDdlParser.parse(usersDdl).foreach(sink.applySchemaChange)
    val e = intercept[Exception] {
      sink.writeBatch(t,
        Seq((1L, "x" * 5000, 5)).toDF("id", "name", "score"), // > VARCHAR(4000)
        Seq.empty[Long].toDF("id"), batchId = 0L, runId = "failrun")
    }
    def chain(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    val msgs = chain(e).mkString(" | ").toLowerCase
    assert(msgs.contains("truncat"), s"expected the truncation failure, got: $msgs")
    assert(!msgs.contains("invalid transaction state"),
      s"close()'s refusal masked the real failure: $msgs")
    // and the sink remains usable: the staging reset clears the debris
    sink.writeBatch(t,
      Seq((1L, "ok", 5)).toDF("id", "name", "score"),
      Seq.empty[Long].toDF("id"), batchId = 1L, runId = "failrun")
    assert(query(db, "SELECT NAME FROM APP_USERS") == Seq(Seq("ok")))
  }

  test("stale run id never swallows a fresh run's first batches") {
    val db = freshDb()
    val sink = new JdbcTwoPhaseSink(s"jdbc:derby:$db", appendOnly = true)
    val t = TableId.of("app", "ledger")
    sink.applySchemaChange(CreateTableEvent(t, ledgerSchema))
    sink.writeBatch(t, Seq((1L, 100)).toDF("txn", "amount"),
      Seq.empty[Long].toDF("txn"), batchId = 9L, runId = "old-run")
    // new checkpoint: batch ids restart at 0 — must NOT be skipped
    sink.writeBatch(t, Seq((2L, 200)).toDF("txn", "amount"),
      Seq.empty[Long].toDF("txn"), batchId = 0L, runId = "new-run")
    assert(query(db, "SELECT count(*) FROM app_ledger").head.head == 2)
  }

  test("c_jdbc_2pc query: crash+replay delivery equals one-shot materialization") {
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sf0001
    val viaCrashReplay = graft.QueriesCore.queries("c_jdbc_2pc")(spark, dir)
    val direct = graft.operators.Upsert.materialize(
      graft.QueriesCore.eventsChangelog(spark, dir), Seq("user_id"))
      .select(viaCrashReplay.columns.map(col).toIndexedSeq: _*)
    assert(viaCrashReplay.count() == direct.count())
    assert(viaCrashReplay.exceptAll(direct).isEmpty && direct.exceptAll(viaCrashReplay).isEmpty)
  }

  test("mysql/postgres promote statement shapes") {
    val t = TableId.of("app", "users")
    // statement shapes via a sink whose DDL never touches a database
    class ShapeSink(dialect: String) extends JdbcTwoPhaseSink("jdbc:none", dialect) {
      private val mgr = new SchemaManager
      override def applySchemaChange(event: SchemaChangeEvent): Unit =
        { mgr.applySchemaChange(event); () }
      override def schemaOf(tid: TableId): Option[TableSchema] = mgr.latest(tid)
      def stmts(tid: TableId): Seq[String] = promoteStatements(tid)
    }
    def build(dialect: String): ShapeSink = {
      val s = new ShapeSink(dialect)
      MySqlDdlParser.parse(usersDdl).foreach(s.applySchemaChange)
      s
    }
    val my = build("mysql")
    val pg = build("postgres")
    val myStmts = my.stmts(t)
    val pgStmts = pg.stmts(t)
    assert(myStmts.exists(_.contains("ON DUPLICATE KEY UPDATE name = VALUES(name)")))
    assert(myStmts.exists(_.startsWith("DELETE t FROM app_users t JOIN app_users_STAGE s")))
    assert(pgStmts.exists(_.contains("ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name")))
    assert(pgStmts.exists(_.startsWith("DELETE FROM app_users t USING app_users_STAGE s")))
  }
}
