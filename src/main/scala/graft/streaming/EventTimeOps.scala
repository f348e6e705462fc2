package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators — the Structured-Streaming surface the
  * reference delegates to Flink's windowing/state APIs, expressed with
  * watermarks + windowed aggregates and `flatMapGroupsWithState`:
  *
  *  - windowed aggregation with a watermark bounds state: closed windows are
  *    emitted once (append mode) and their state evicted — at 100 TB/day the
  *    state store holds only open windows per key, not history;
  *  - sessionization holds ONE small state object per active key
  *    (`flatMapGroupsWithState` + event-time timeout), the
  *    `KeyValueGroupedDataset` custom-state path the brief calls for.
  */
object EventTimeOps {

  /** Per-(window, event_type) counts/sums over event time with a watermark.
    * Append mode: a window row is emitted exactly once, when the watermark
    * passes its end — the streaming form of `q_events_daily`.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour",
      windowLength: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, events: Int, sum: Double)
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      sum_value: Double)

  /** Gap-based sessionization with custom state: one `SessionState` per
    * ACTIVE user (event-time timeout closes idle sessions and frees the
    * state), sessions emitted when the gap elapses. State is O(active keys),
    * independent of stream length — the property that matters at scale.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMillis: Long,
      watermarkDelay: String = "10 minutes")(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    def fold(
        userId: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[Session] = {
      def emit(s: SessionState): Session = Session(
        userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
        s.events, s.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        // uniform interval-gap merge over {existing state} ∪ {batch events}:
        // sort by start, fold adjacent intervals whose gap ≤ gapMillis. This
        // handles in-order data, late events extending the session start
        // backwards, AND late events that form their own earlier session
        // (which must merge with EACH OTHER, not emit as singletons).
        val items = (state.getOption.toVector ++
          batch.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
          .sortBy(s => (s.start, s.end))
        val merged = items.foldLeft(Vector.empty[SessionState]) { (acc, it) =>
          acc.lastOption match {
            case Some(last) if it.start - last.end <= gapMillis =>
              acc.init :+ SessionState(
                last.start, math.max(last.end, it.end),
                last.events + it.events, last.sum + it.sum)
            case _ => acc :+ it
          }
        }
        if (merged.isEmpty) Iterator.empty
        else {
          // everything except the latest interval can no longer grow (any
          // joinable event would have merged); the latest stays open in state
          val open = merged.last
          state.update(open)
          // close when the WATERMARK (not wall clock) passes session end + gap
          state.setTimeoutTimestamp(open.end + gapMillis)
          merged.init.map(emit).iterator
        }
      }
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Watermarked stream-stream INTERVAL join: left events match right events
    * on `keyCol` within `[left.ts, left.ts + window]`. Both sides carry
    * watermarks and the join condition time-bounds BOTH event times, so the
    * state store retains each side only for the interval + watermark horizon
    * — the bounded-state contract that makes stream-stream joins viable at
    * 100 TB/day (an unbounded-state join would OOM; Spark enforces the bound
    * from exactly this shape).
    *
    * The two inputs must already have distinct column names apart from
    * `keyCol` and their `tsCol`s (rename before calling).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      window: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $window"))
      .drop(r(keyCol))
  }
}
