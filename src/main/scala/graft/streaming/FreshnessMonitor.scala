package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EP3 — streaming currency monitor (reference `factors/3-current.md:15`:
  * "freshness monitoring alerts when data falls outside SLA";
  * `requirements.yaml:91-97`). Structured Streaming, never DStream
  * (SURVEY.md §1.3).
  *
  * The transform is source-agnostic: bind it to `spark.readStream` (file
  * source on the events directory in production, MemoryStream in tests).
  * Watermark bounds state: late events beyond the slack are dropped and the
  * per-window state is evicted — state size is O(windows in flight), not
  * O(events), which is what lets this run forever on a real cluster.
  */
object FreshnessMonitor {

  /** Windowed freshness over a (possibly streaming) events frame with an
    * event-time `ts` column: per tumbling window, the latest event time,
    * event count, and whether the window's max lag vs its close exceeds
    * the SLA.
    *
    * Works identically on a batch DataFrame (test oracle) and a streaming
    * one (the deployment mode) — same plan, different sink.
    */
  def windowedFreshness(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes", slaMinutes: Long = 30L): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(max(col("ts")).as("latest_ts"), count(lit(1)).as("n_events"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("latest_ts"), col("n_events"),
        (unix_timestamp(col("w.end")) - unix_timestamp(col("latest_ts")) >
          slaMinutes * 60L).as("sla_breach"))

  /** CDC idempotency (reference `requirements.yaml:123-125` incremental
    * processing; SURVEY.md §2.B "stateful dedup"): drop replayed events by
    * id, with state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` evicts ids older than the watermark
    * instead of growing state forever like plain dropDuplicates would on a
    * stream.
    */
  def dedupedStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Event sessionization via native session windows (gap-based, state
    * evicted at watermark): per user session, span and event count.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))
}
