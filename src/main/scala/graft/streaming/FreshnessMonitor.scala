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
}
