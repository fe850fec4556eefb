package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event against a monitored asset (the per-key input of the stateful
  * freshness tracker).
  */
final case class AssetEvent(asset: String, ts: Timestamp)

/** Tracker state per asset: latest event time and current freshness. */
final case class FreshnessState(latestMs: Long, fresh: Boolean)

/** Emitted ONLY on a freshness transition (first sight → fresh, SLA expiry
  * → stale, recovery → fresh) — the alert stream, not a per-event echo.
  */
final case class FreshnessTransition(asset: String, latest_ts: Timestamp,
    fresh: Boolean)

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

  /** Per-asset freshness TRANSITIONS via custom state
    * (`flatMapGroupsWithState`, SURVEY.md §1.3 / driver mandate): unlike
    * the windowed monitor (which re-reports every window), this emits only
    * when an asset CHANGES state — first event → fresh, no events for
    * `slaMs` past the latest (detected by event-time timeout against the
    * watermark) → stale, next event → fresh again.
    *
    * State is one (long, boolean) per asset — O(assets), not O(events);
    * the event-time timeout re-arms at latestTs + slaMs, so eviction and
    * alerting ride the watermark, no external clock. Works in batch mode
    * too (no timeouts fire; each asset emits its initial fresh row).
    */
  def freshnessTransitions(events: Dataset[AssetEvent],
      slaMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): Dataset[FreshnessTransition] = {
    import events.sparkSession.implicits._
    // batch mode: withWatermark is a no-op and watermark/timeout calls
    // throw — capture the mode once, driver-side, into the closure
    val streaming = events.isStreaming

    def update(asset: String, evs: Iterator[AssetEvent],
        state: GroupState[FreshnessState]): Iterator[FreshnessTransition] = {
      if (state.hasTimedOut) {
        val s = state.get
        // no timeout re-arm: a stale asset stays silent until a new event
        state.update(FreshnessState(s.latestMs, fresh = false))
        Iterator(FreshnessTransition(asset, new Timestamp(s.latestMs), fresh = false))
      } else {
        val maxMs = evs.map(_.ts.getTime).max // evs non-empty when no timeout
        val prev = state.getOption
        val latest = prev.fold(maxMs)(p => math.max(p.latestMs, maxMs))
        // a late batch can arrive ALREADY stale (latest + sla <= watermark);
        // arming a timeout in the past would throw — classify directly
        val isFresh = !streaming || state.getCurrentWatermarkMs() < latest + slaMs
        state.update(FreshnessState(latest, isFresh))
        if (streaming && isFresh) state.setTimeoutTimestamp(latest + slaMs)
        if (prev.map(_.fresh).contains(isFresh)) Iterator.empty // no change
        else Iterator(FreshnessTransition(asset, new Timestamp(latest), isFresh))
      }
    }

    // Update mode: a transition is an upsert on the asset's alert row (and
    // the sink's output mode must match the operator's declared mode)
    events.withWatermark("ts", watermark)
      .groupByKey(_.asset)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

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

  /** Stream-STREAM interval join: attribute each conversion to the
    * trigger event by the same user within the attribution window
    * (trigger.ts <= conversion.ts <= trigger.ts + window). Watermarks on
    * BOTH sides bound the join state — Spark evicts buffered rows once
    * the other side's watermark passes the interval, so state is
    * O(events in window), not unbounded (Factor 3's "streams" mechanism,
    * `/root/reference/factors/3-current.md:12-15`, applied to the
    * correlation the reference's Factor 4 traceability presupposes).
    *
    * @param triggers    streaming (user_id, ts) trigger events
    * @param conversions streaming (user_id, ts) conversion events
    * @param leftOuter true → also emit triggers that never converted
    *        (null conversion_ts), released once the conversion-side
    *        watermark passes their window — the "abandoned funnel" feed.
    */
  def attributionJoin(triggers: DataFrame, conversions: DataFrame,
      windowMinutes: Int = 10, watermark: String = "10 minutes",
      leftOuter: Boolean = false): DataFrame = {
    val t = triggers.withWatermark("ts", watermark).alias("t")
    val c = conversions.withWatermark("ts", watermark).alias("c")
    t.join(c, expr(
      s"""t.user_id = c.user_id AND
         |c.ts >= t.ts AND
         |c.ts <= t.ts + interval $windowMinutes minutes""".stripMargin),
      if (leftOuter) "left_outer" else "inner")
      .select(col("t.user_id").as("user_id"),
        col("t.ts").as("trigger_ts"), col("c.ts").as("conversion_ts"))
  }
}
