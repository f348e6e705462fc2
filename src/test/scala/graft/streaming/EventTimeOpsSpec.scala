package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time semantics under a controlled MemoryStream clock: windows close
  * exactly when the watermark passes, late data is dropped, sessions split on
  * the gap and close via event-time timeout.
  */
class EventTimeOpsSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("windowed counts emit once per closed window; late rows are dropped") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    implicit val enc: org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Row]
    val out = EventTimeOps.windowedCounts(
      stream.toDF(), watermarkDelay = "1 hour", windowLength = "1 day")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()

    // day 1 data
    stream.addData(
      Row(ts("2024-01-01 10:00:00"), "click", 1.0),
      Row(ts("2024-01-01 11:00:00"), "click", 2.0),
      Row(ts("2024-01-01 12:00:00"), "view", 5.0))
    q.processAllAvailable()
    // nothing emitted: watermark has not passed day-1's end
    assert(spark.sql("SELECT * FROM wc").count() == 0)

    // day 2 advances the watermark past day 1 -> day-1 windows close
    stream.addData(Row(ts("2024-01-02 02:00:00"), "click", 7.0))
    q.processAllAvailable()
    stream.addData(Row(ts("2024-01-02 03:00:00"), "view", 1.0)) // nudge batch
    q.processAllAvailable()
    val day1 = spark.sql(
      "SELECT event_type, n, sum_value FROM wc WHERE window_start = '2024-01-01'")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(day1 == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))

    // a LATE day-1 row (behind the watermark) must be dropped, not re-emitted
    stream.addData(Row(ts("2024-01-01 09:00:00"), "click", 100.0))
    q.processAllAvailable()
    val day1After = spark.sql(
      "SELECT sum(n) FROM wc WHERE window_start = '2024-01-01'").head().getLong(0)
    assert(day1After == 3L) // unchanged
    q.stop()
  }

  test("sessionize: an in-watermark late event extends the session start backwards") {
    import EventTimeOps._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = sessionize(stream.toDS(), gapMillis = 60000,
      watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sesslate")
      .outputMode("append").start()

    stream.addData(SessionEvent(1L, ts("2024-01-01 12:00:05"), 1.0))
    q.processAllAvailable()
    // late but above the 10-min watermark: 15s BEFORE the session start —
    // must merge and move session_start back, not inherit the newer start
    stream.addData(SessionEvent(1L, ts("2024-01-01 11:59:50"), 2.0))
    q.processAllAvailable()
    // close via watermark advance on another key
    stream.addData(SessionEvent(2L, ts("2024-01-01 13:00:00"), 0.0))
    q.processAllAvailable()
    stream.addData(SessionEvent(2L, ts("2024-01-01 13:30:00"), 0.0))
    q.processAllAvailable()
    val u1 = spark.sql(
      "SELECT session_start, session_end, n_events, sum_value FROM sesslate WHERE user_id = 1")
      .collect()
    assert(u1.length == 1)
    assert(u1.head.getTimestamp(0) == ts("2024-01-01 11:59:50"), u1.head.toString)
    assert(u1.head.getTimestamp(1) == ts("2024-01-01 12:00:05"))
    assert(u1.head.getInt(2) == 2 && u1.head.getDouble(3) == 3.0)
    q.stop()
  }

  test("sessionize: two late events before the session merge with each other") {
    import EventTimeOps._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = sessionize(stream.toDS(), gapMillis = 60000,
      watermarkDelay = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sesspair")
      .outputMode("append").start()

    stream.addData(SessionEvent(1L, ts("2024-01-01 12:00:05"), 1.0))
    q.processAllAvailable()
    // two in-watermark late events 10 min before the session, 30 s apart:
    // they are joinable with EACH OTHER (one earlier session), not with the
    // current session — must emit ONE closed session of 2 events
    stream.addData(
      SessionEvent(1L, ts("2024-01-01 11:50:00"), 2.0),
      SessionEvent(1L, ts("2024-01-01 11:50:30"), 3.0))
    q.processAllAvailable()
    val closed = spark.sql(
      "SELECT session_start, session_end, n_events, sum_value FROM sesspair WHERE user_id = 1")
      .collect()
    assert(closed.length == 1, closed.mkString(";"))
    assert(closed.head.getTimestamp(0) == ts("2024-01-01 11:50:00"))
    assert(closed.head.getTimestamp(1) == ts("2024-01-01 11:50:30"))
    assert(closed.head.getInt(2) == 2 && closed.head.getDouble(3) == 5.0)
    q.stop()
  }

  test("sessionize: gap splits sessions, event-time timeout closes idle ones") {
    import EventTimeOps._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = sessionize(stream.toDS(), gapMillis = 60000, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    // user 1: two bursts separated by > 1 min (same batch) -> first closes
    stream.addData(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 10:00:30"), 2.0),
      SessionEvent(1L, ts("2024-01-01 10:05:00"), 3.0))
    q.processAllAvailable()
    val afterSplit = spark.sql("SELECT n_events, sum_value FROM sess").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(afterSplit == Set((2, 3.0)))

    // watermark advance (another user far in the future) times out the
    // open session via EVENT-time, emitting it without new user-1 data
    stream.addData(SessionEvent(2L, ts("2024-01-01 11:00:00"), 9.0))
    q.processAllAvailable()
    stream.addData(SessionEvent(2L, ts("2024-01-01 11:30:00"), 9.0))
    q.processAllAvailable()
    val u1 = spark.sql("SELECT n_events, sum_value FROM sess WHERE user_id = 1").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(u1 == Set((2, 3.0), (1, 3.0)))
    q.stop()
  }

  test("intervalJoin: matches only within the window, state is watermark-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lSchema = StructType(Seq(
      StructField("k", LongType), StructField("l_ts", TimestampType)))
    val rSchema = StructType(Seq(
      StructField("k", LongType), StructField("r_ts", TimestampType),
      StructField("v", DoubleType)))
    def enc(s: StructType) =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(s))
    val left = MemoryStream[Row](101, spark, None)(enc(lSchema))
    val right = MemoryStream[Row](102, spark, None)(enc(rSchema))
    val joined = EventTimeOps.intervalJoin(
      left.toDF(), right.toDF(), keyCol = "k",
      leftTs = "l_ts", rightTs = "r_ts", window = "1 hour",
      watermarkDelay = "10 minutes")
    // the plan must carry watermarks on both sides (bounded state); an
    // unbounded stream-stream join would be rejected in append mode
    val q = joined.writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      left.addData(Row(1L, ts("2024-01-01 10:00:00")), Row(2L, ts("2024-01-01 10:00:00")))
      right.addData(
        Row(1L, ts("2024-01-01 10:30:00"), 5.0), // in window
        Row(1L, ts("2024-01-01 11:30:00"), 6.0), // past window
        Row(1L, ts("2024-01-01 09:30:00"), 7.0), // before left event
        Row(2L, ts("2024-01-01 11:00:00"), 8.0)) // boundary: exactly +1h
      q.processAllAvailable()
      val got = spark.sql("SELECT k, v FROM ij").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 5.0), (2L, 8.0)))
    } finally q.stop()
  }
}
