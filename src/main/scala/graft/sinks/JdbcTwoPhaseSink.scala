package graft.sinks

import graft.core._
import org.apache.spark.sql.DataFrame

import java.sql.{Connection, DriverManager}

/** Exactly-once JDBC sink via staging-table two-phase commit — the micro-batch
  * form of the transactional guarantee the reference's sinks inherit from
  * Flink sink v2 2PC (`flink-cdc-runtime/.../operators/sink/
  * DataSinkWriterOperator.java` + the framework's `TwoPhaseCommittingSink`).
  *
  * [[JdbcUpsertSink]] is idempotent at-least-once: data lands per-partition,
  * the commit record lands afterwards, and a crash in between re-applies the
  * whole batch — harmless for PK upserts, WRONG for a non-idempotent target
  * (append-only ledger, aggregating table). This sink closes that hole:
  *
  *  - '''Phase 1 — prepare (executors):''' each partition INSERTs its rows
  *    into `<table>_STAGE` (payload columns + `G_OP` marker + run/batch audit
  *    columns) and commits. Staging writes are repeatable: a replayed prepare
  *    first clears the staging table, so duplicates cannot accumulate.
  *  - '''Phase 2 — promote (driver, ONE transaction):''' a single in-database
  *    statement moves staged rows into the target (`MERGE INTO` on the
  *    generic/Derby path, upsert-SELECT shapes for mysql/postgres), the batch
  *    commit record is updated, and the staging rows are deleted — all in the
  *    same transaction. The target mutation and the "this batch is done"
  *    record become atomic: a crash anywhere rolls back to "nothing applied,
  *    not recorded" and the replay re-runs both phases; a completed promote is
  *    skipped wholesale on replay via the recorded batch id.
  *
  * Scale shape: phase 1 is executor-parallel (the same `foreachPartition`
  * throughput path as [[JdbcUpsertSink]]); phase 2 is a constant number of
  * set-based SQL statements executed INSIDE the database — no row ever moves
  * through the driver.
  *
  * Single-writer-per-table protocol (same as the reference's one-job-per-sink
  * topology): the staging table holds at most one in-flight batch.
  *
  * `appendOnly = true` targets tables without primary keys (ledgers, event
  * logs): promote degenerates to `INSERT … SELECT` and deletes are rejected —
  * this is the mode whose exactly-once behavior PK-upsert absorption cannot
  * imitate.
  */
class JdbcTwoPhaseSink(
    url: String,
    dialectName: String = "generic",
    props: Map[String, String] = Map.empty,
    batchSize: Int = 1024,
    appendOnly: Boolean = false)
    extends DataSink {

  private val schemas = new SchemaManager

  private def tableName(t: TableId): String =
    Seq(t.schemaName, t.tableName).filter(_.nonEmpty).mkString("_")
  private def stageName(t: TableId): String = tableName(t) + "_STAGE"

  private def connect(): Connection = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  // ---------------------------------------------------------- MetadataApplier

  override def applySchemaChange(event: SchemaChangeEvent): Unit = {
    schemas.applySchemaChange(event)
    val ddl: Seq[String] = event match {
      case CreateTableEvent(t, s) =>
        // staging mirror: payload columns all-nullable (delete rows carry only
        // PKs), no PK constraint (op rows are not unique rows of the target),
        // plus the op marker and run/batch audit columns
        val stageCols = s.struct.fields.map(f => s"${f.name} ${JdbcDdl.sqlType(f.dataType)}") ++
          Seq("G_OP CHAR(1) NOT NULL", "G_RUN VARCHAR(1024)", "G_BATCH BIGINT",
            "G_PART INT")
        JdbcDdl.statements(event, tableName, dialectName) :+
          s"CREATE TABLE ${stageName(t)} (${stageCols.mkString(", ")})"
      case other =>
        // structural changes apply to BOTH physical tables so staged rows
        // always bind 1:1 to target columns
        JdbcDdl.statements(other, tableName, dialectName) ++
          JdbcDdl.statements(other, stageName, dialectName)
    }
    val conn = connect()
    try {
      val st = conn.createStatement()
      // a restarted job re-applies CREATEs against tables that already exist
      // (no IF NOT EXISTS in Derby): swallow those, like the commit-log
      // create; real problems surface on first use of the table
      try ddl.foreach { d =>
        try st.executeUpdate(d)
        catch {
          case _: java.sql.SQLException if d.startsWith("CREATE TABLE") => ()
        }
      } finally st.close()
    } finally conn.close()
  }

  // ------------------------------------------------------------------ phase 1

  /** Clears any previous in-flight batch, then stages `upserts` (op `U`) and
    * `deletedKeys` (op `D`) from the executors. Repeatable by construction.
    */
  private def prepare(
      t: TableId,
      upserts: DataFrame,
      deletedKeys: DataFrame,
      batchId: Long,
      runId: String): Unit = {
    val schema = schemaOf(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val stage = stageName(t)
    val pks = schema.primaryKeys
    if (appendOnly) {
      require(deletedKeys.isEmpty,
        s"append-only 2PC sink for $t cannot apply deletes")
    } else {
      require(pks.nonEmpty, s"merge-mode 2PC sink requires primary keys for $t")
    }

    // replay reset: a crash between prepare and promote leaves staged rows
    // behind; the re-delivered batch must not double them
    val conn = connect()
    try {
      conn.createStatement().executeUpdate(s"DELETE FROM $stage")
    } finally conn.close()

    val (jdbcUrl, properties, bs) = (url, props, batchSize)
    def stagePartitioned(df: DataFrame, op: String): Unit = {
      val cols = df.columns.toSeq
      val sql = s"INSERT INTO $stage (${cols.mkString(", ")}, G_OP, G_RUN, G_BATCH, G_PART) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}, ?, ?, ?, ?)"
      val n = cols.length
      df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val p = new java.util.Properties()
        properties.foreach { case (k, v) => p.setProperty(k, v) }
        val c = DriverManager.getConnection(jdbcUrl, p)
        c.setAutoCommit(false)
        try {
          // task-level idempotence: a RETRY of a task whose commit landed
          // but whose success report was lost would double its partition's
          // staged rows (the driver-side stage reset runs once per batch,
          // not per task). Replacing this task's own slice inside the ONE
          // staging transaction makes the last committed attempt win.
          // (Concurrent SPECULATIVE duplicates could still interleave —
          // this sink requires spark.speculation=false, Spark's default.)
          val del = c.prepareStatement(
            s"DELETE FROM $stage WHERE G_PART = ? AND G_OP = ?")
          del.setInt(1, part); del.setString(2, op)
          del.executeUpdate(); del.close()
          val ps = c.prepareStatement(sql)
          var i = 0
          rows.foreach { r =>
            (0 until n).foreach(j => ps.setObject(j + 1, r.get(j)))
            ps.setString(n + 1, op); ps.setString(n + 2, runId); ps.setLong(n + 3, batchId)
            ps.setInt(n + 4, part)
            ps.addBatch(); i += 1
            if (i % bs == 0) ps.executeBatch()
          }
          ps.executeBatch(); ps.close()
          c.commit()
        } finally {
          // a failed batch leaves an open transaction; Derby (and others)
          // refuse close() mid-transaction, and that SQLException would mask
          // the original task failure — roll back first, as promote() does
          try c.rollback() catch { case _: java.sql.SQLException => () }
          c.close()
        }
      }
    }
    stagePartitioned(upserts, "U")
    if (!appendOnly) stagePartitioned(deletedKeys.selectExpr(pks: _*), "D")
  }

  // ------------------------------------------------------------------ phase 2

  /** Dialect promote statements, exposed for statement-shape tests. All rows
    * move inside the database; the driver only issues the statements.
    */
  private[sinks] def promoteStatements(t: TableId): Seq[String] = {
    val schema = schemaOf(t).getOrElse(
      throw new IllegalStateException(s"table $t not created"))
    val target = tableName(t)
    val stage = stageName(t)
    val cols = schema.columnNames
    val pks = schema.primaryKeys
    val nonPk = cols.filterNot(pks.contains)
    val colList = cols.mkString(", ")
    if (appendOnly)
      Seq(s"INSERT INTO $target ($colList) SELECT $colList FROM $stage WHERE G_OP <> 'D'")
    else {
      val onPk = pks.map(k => s"t.$k = s.$k").mkString(" AND ")
      dialectName match {
        case "mysql" =>
          val upd =
            if (nonPk.isEmpty) s"${pks.head} = ${pks.head}"
            else nonPk.map(c => s"$c = VALUES($c)").mkString(", ")
          Seq(
            s"DELETE t FROM $target t JOIN $stage s ON $onPk AND s.G_OP = 'D'",
            s"INSERT INTO $target ($colList) SELECT $colList FROM $stage WHERE G_OP <> 'D' " +
              s"ON DUPLICATE KEY UPDATE $upd")
        case "postgres" =>
          val action =
            if (nonPk.isEmpty) "DO NOTHING"
            else s"DO UPDATE SET ${nonPk.map(c => s"$c = EXCLUDED.$c").mkString(", ")}"
          Seq(
            s"DELETE FROM $target t USING $stage s " +
              s"WHERE ${pks.map(k => s"t.$k = s.$k").mkString(" AND ")} AND s.G_OP = 'D'",
            s"INSERT INTO $target ($colList) SELECT $colList FROM $stage WHERE G_OP <> 'D' " +
              s"ON CONFLICT (${pks.mkString(", ")}) $action")
        case _ => // ANSI / Derby: one MERGE covers upsert + delete
          val matched =
            if (nonPk.isEmpty) ""
            else s"WHEN MATCHED THEN UPDATE SET ${nonPk.map(c => s"$c = s.$c").mkString(", ")} "
          Seq(
            s"MERGE INTO $target t USING $stage s ON $onPk " +
              s"WHEN MATCHED AND s.G_OP = 'D' THEN DELETE " + matched +
              s"WHEN NOT MATCHED AND s.G_OP <> 'D' THEN INSERT ($colList) " +
              s"VALUES (${cols.map(c => s"s.$c").mkString(", ")})")
      }
    }
  }

  /** The atomic half: target mutation + commit record + staging cleanup in one
    * database transaction.
    */
  private def promote(t: TableId, batchId: Long, runId: String): Unit = {
    val conn = connect()
    conn.setAutoCommit(false)
    try {
      val st = conn.createStatement()
      try promoteStatements(t).foreach(st.executeUpdate)
      finally st.close()
      if (batchId >= 0) upsertCommitRecord(conn, tableName(t), batchId, runId)
      conn.createStatement().executeUpdate(s"DELETE FROM ${stageName(t)}")
      beforeCommit(conn)
      conn.commit()
    } finally {
      // a crash path reaches here mid-transaction: roll back explicitly —
      // Derby refuses close() with an active transaction, and the close
      // SQLException would mask the original failure
      try conn.rollback() catch { case _: java.sql.SQLException => () }
      conn.close()
    }
  }

  /** Crash-injection seams for the exactly-once tests. */
  protected def onPrepared(): Unit = ()
  protected def beforeCommit(conn: Connection): Unit = ()

  // ------------------------------------------------------------------ writes

  override def writeBatch(t: TableId, upserts: DataFrame, deletedKeys: DataFrame): Unit = {
    // untracked write: full protocol, no commit record
    prepare(t, upserts, deletedKeys, batchId = -1L, runId = "")
    onPrepared()
    promote(t, batchId = -1L, runId = "")
  }

  override def writeBatch(
      t: TableId,
      upserts: DataFrame,
      deletedKeys: DataFrame,
      batchId: Long,
      runId: String): Unit =
    if (batchId < 0) {
      writeBatch(t, upserts, deletedKeys)
    } else if (lastCommittedBatch(t, runId).forall(_ < batchId)) {
      prepare(t, upserts, deletedKeys, batchId, runId)
      onPrepared()
      promote(t, batchId, runId)
    }

  // ------------------------------------------------- commit record (shared txn)

  @transient private lazy val commitLogReady: Boolean = {
    val conn = connect()
    try {
      try {
        conn.createStatement().executeUpdate(
          "CREATE TABLE GRAFT_COMMITS (TABLE_NAME VARCHAR(256) NOT NULL PRIMARY KEY, " +
            "RUN_ID VARCHAR(1024) NOT NULL, BATCH_ID BIGINT NOT NULL)")
      } catch { case _: java.sql.SQLException => () } // exists (possibly via JdbcUpsertSink)
      true
    } finally conn.close()
  }

  private def upsertCommitRecord(
      conn: Connection, table: String, batchId: Long, runId: String): Unit = {
    require(commitLogReady)
    val upd = conn.prepareStatement(
      "UPDATE GRAFT_COMMITS SET BATCH_ID = ?, RUN_ID = ? WHERE TABLE_NAME = ?")
    upd.setLong(1, batchId); upd.setString(2, runId); upd.setString(3, table)
    if (upd.executeUpdate() == 0) {
      val ins = conn.prepareStatement(
        "INSERT INTO GRAFT_COMMITS (TABLE_NAME, RUN_ID, BATCH_ID) VALUES (?, ?, ?)")
      ins.setString(1, table); ins.setString(2, runId); ins.setLong(3, batchId)
      ins.executeUpdate()
    }
  }

  override def lastCommittedBatch(t: TableId, runId: String): Option[Long] = {
    require(commitLogReady)
    val conn = connect()
    try {
      val ps = conn.prepareStatement(
        "SELECT RUN_ID, BATCH_ID FROM GRAFT_COMMITS WHERE TABLE_NAME = ?")
      ps.setString(1, tableName(t))
      val rs = ps.executeQuery()
      if (rs.next() && rs.getString(1) == runId) Some(rs.getLong(2)) else None
    } finally conn.close()
  }

  override def recordBatchCommit(t: TableId, batchId: Long, runId: String): Unit = {
    val conn = connect()
    conn.setAutoCommit(false)
    try { upsertCommitRecord(conn, tableName(t), batchId, runId); conn.commit() }
    finally conn.close()
  }

  override def schemaOf(t: TableId): Option[TableSchema] = schemas.latest(t)
}
