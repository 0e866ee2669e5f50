package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
