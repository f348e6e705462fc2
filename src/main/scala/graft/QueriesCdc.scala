package graft

import graft.core._
import graft.sources.Tables
import graft.sources.cdc._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end correctness entry for the DSv2 incremental-snapshot source: a
  * scripted change source seeded from the `events` table runs through the real
  * Structured-Streaming runtime (chunked snapshot phase, then a log phase fed
  * between micro-batches), the emitted envelope is PK-materialized, and the
  * result equals a plain SQL reduction of the same events — verified by the
  * DuckDB oracle.
  */
object QueriesCdc {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_incremental" -> ((s, dir) => {
      val t = TableId.parse("app.users")
      val schema = TableSchema(
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("v", StringType))),
        primaryKeys = Seq("id"))
      val initial = (0L until 150L).map(u => Map[String, Any]("id" -> u, "v" -> "init"))
      val src = new ScriptedChangeSource(t, schema, initial)
      val srcId = s"verify-incremental-${java.util.UUID.randomUUID()}"
      ChangeSourceRegistry.register(srcId, src)
      try {
        val ev = Tables.load(s, dir, "events")
          .filter(col("event_id") < 300 && col("user_id") < 150)
          .select(col("event_id"), col("user_id"))
          .orderBy("event_id")
          .collect()
        val (pre, post) = ev.splitAt(ev.length / 2)
        def append(r: Row): Unit = src.append(DataChangeEvent.update(
          t,
          Map("id" -> r.getLong(1)),
          Map("id" -> r.getLong(1), "v" -> s"e${r.getLong(0)}")))

        // phase A: changes while "the snapshot is running" (merged by backfill)
        pre.foreach(append)

        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        val q = s.readStream.format(classOf[GraftCdcProvider].getName)
          .option("sourceId", srcId)
          .option("chunk.size", "40")
          .load()
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) => buf ++= b.collect(); () }
          .start()
        q.processAllAvailable() // snapshot phase done
        // phase B: post-snapshot log events flow through the stream phase
        post.foreach(append)
        q.processAllAvailable()
        q.stop()

        // PK-materialize the emitted envelope (max seq wins, DELETE drops)
        val byKey = scala.collection.mutable.Map.empty[Long, (Long, String)]
        buf.foreach { r =>
          val op = r.getString(1)
          val after = r.getStruct(3); val before = r.getStruct(2)
          val id = if (after != null) after.getLong(0) else before.getLong(0)
          val seq = r.getLong(4)
          if (byKey.get(id).forall(_._1 <= seq))
            byKey(id) = (seq, if (op == "DELETE") null else after.getString(1))
        }
        val rows = byKey.toSeq.collect { case (id, (_, v)) if v != null => (id, v) }
        import s.implicits._
        rows.toDF("id", "v").orderBy("id")
      } finally ChangeSourceRegistry.remove(srcId)
    }))

  val oracles: Map[String, String] = Map(
    "c_incremental" ->
      """WITH e AS (
        |  SELECT user_id, event_id FROM events WHERE event_id < 300 AND user_id < 150),
        |last AS (SELECT user_id, max(event_id) AS me FROM e GROUP BY user_id)
        |SELECT u.id, COALESCE('e' || CAST(l.me AS VARCHAR), 'init') AS v
        |FROM range(150) AS u(id) LEFT JOIN last l ON l.user_id = u.id
        |ORDER BY u.id""".stripMargin)
}
