package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowing over the `events` table — the streaming extension
  * (the reference has no stream engine; SURVEY.md §2.9). The same
  * `window`/`session_window` groupings run identically over a bounded
  * DataFrame and a `readStream` source; `streamingAgg` shows the
  * watermarked streaming form.
  */
object Windows {

  /** Tumbling window aggregate (batch or streaming input). */
  def tumbling(events: DataFrame, tsCol: String, duration: String): DataFrame =
    events.groupBy(window(col(tsCol), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Det.r2(sum(col("value"))).as("sum_val"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_val"))

  /** Sliding window aggregate. */
  def sliding(events: DataFrame, tsCol: String, duration: String,
              slide: String): DataFrame =
    events.groupBy(window(col(tsCol), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-based). */
  def sessions(events: DataFrame, tsCol: String, gap: String): DataFrame =
    events.groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.functions.Det.r2(sum(col("value"))).as("sum_val"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_val"))

  /** Streaming form with watermark-bounded state (late data beyond
    * `watermark` dropped) — for `readStream` sources.
    */
  def streamingAgg(stream: DataFrame, tsCol: String, duration: String,
                   watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`): exact dedup on a key column for
    * streams, where state for a key is dropped once the watermark passes
    * it — the streaming form of `Dedup.exact`, with memory bounded by
    * the watermark horizon instead of the corpus size.
    */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCol: String,
                     watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join — the remaining streaming join
    * surface: left rows match right rows with the same key whose
    * timestamp falls in [lTs − before, lTs + after]. Column names must
    * be distinct across the two sides (rename before calling). The same
    * declarative join runs over bounded frames (gated as w5) and over
    * two watermarked streams, where the time-interval condition is what
    * lets Spark prune join state to the watermark horizon — without it
    * both sides' state grows forever.
    */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rTs: String,
                   before: String, after: String): DataFrame =
    left.join(right, col(lKey) === col(rKey) &&
      col(rTs) >= col(lTs) - expr(s"INTERVAL $before") &&
      col(rTs) <= col(lTs) + expr(s"INTERVAL $after"))

  // ------------------------------------------------------- custom state

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                value: Double)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start: String,
                                 session_end: String, n_events: Long,
                                 sum_val: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-stateful-operator surface (`KeyValueGroupedDataset`) for
    * logic `session_window` can't express. State per user = the open
    * session; a batch's events fold in event-time order, gaps > `gapMs`
    * close-and-emit; an event-time timeout (watermark past
    * sessionEnd+gap) flushes sessions that stopped receiving events.
    * Emitted `session_end` = last event + gap (the `sessions` batch
    * convention).
    *
    * Scale: state is one small record per ACTIVE user (bounded by the
    * watermark), shuffled by user — the same partitioning story as any
    * keyed agg; nothing global.
    *
    * Input stream needs columns (user_id, ts, value) and a watermark on
    * `ts` at least as long as the gap.
    */
  /** `flushOpenAtEnd = true` is the BATCH-mode switch: batch execution
    * calls the state function exactly once per key with every event and
    * then discards state (no timeouts fire), so the trailing open
    * session must be emitted inline to reproduce full sessionization —
    * which also makes the operator oracle-checkable against the
    * window-free SQL sessionization. Leave false for streams.
    */
  def statefulSessions(events: Dataset[SessionEvent], gapMs: Long,
                       flushOpenAtEnd: Boolean = false): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    // NB: formatting happens inside the task; DateTimeFormatter is not
    // serializable, so it is built per call (closed sessions are rare
    // relative to events — negligible)
    def render(u: Long, s: OpenSession): ClosedSession = {
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      ClosedSession(u,
        fmt.format(java.time.Instant.ofEpochMilli(s.startMs)),
        fmt.format(java.time.Instant.ofEpochMilli(s.endMs + gapMs)),
        s.n, s.sum)
    }

    def fn(user: Long, rows: Iterator[SessionEvent],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(render(user, s))
      } else {
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var open = state.getOption.orNull
        // total order (ts, value) so the double fold is deterministic
        rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
          val t = e.ts.getTime
          if (open == null) open = OpenSession(t, t, 1, e.value)
          else if (t - open.endMs >= gapMs) { // gap >= duration breaks (w2 convention)
            closed += render(user, open)
            open = OpenSession(t, t, 1, e.value)
          } else open = OpenSession(open.startMs, math.max(open.endMs, t),
            open.n + 1, open.sum + e.value)
        }
        if (open != null) {
          if (flushOpenAtEnd) closed += render(user, open)
          else {
            state.update(open)
            state.setTimeoutTimestamp(open.endMs + gapMs)
          }
        }
        closed.iterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
