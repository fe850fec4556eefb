package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.FreshnessMonitor

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedFreshness flags the stale window through a real micro-batch run") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Timestamp]
    val monitored = FreshnessMonitor.windowedFreshness(
      input.toDF().withColumnRenamed("value", "ts"),
      windowLen = "1 hour", watermark = "10 minutes", slaMinutes = 30L)

    val q = monitored.writeStream
      .format("memory").queryName("freshness")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // window 10:00-11:00 -> last event 10:05 (lag 55m -> breach)
      // window 11:00-12:00 -> last event 11:58 (lag 2m -> ok)
      input.addData(ts("2024-01-01 10:01:00"), ts("2024-01-01 10:05:00"),
        ts("2024-01-01 11:20:00"), ts("2024-01-01 11:58:00"))
      q.processAllAvailable()
      // advance the watermark past both windows so append-mode emits them
      input.addData(ts("2024-01-01 13:00:00"))
      q.processAllAvailable()

      val rows = spark.table("freshness")
        .select("window_start", "n_events", "sla_breach")
        .as[(Timestamp, Long, Boolean)].collect()
        .map(t => t._1.toString -> ((t._2, t._3))).toMap
      assert(rows("2024-01-01 10:00:00.0") == ((2L, true)))
      assert(rows("2024-01-01 11:00:00.0") == ((2L, false)))
    } finally q.stop()
  }

  test("same transform runs in plain batch mode (test oracle parity)") {
    val batch = Seq(ts("2024-01-01 10:01:00"), ts("2024-01-01 10:59:00"))
      .toDF("ts")
    val out = FreshnessMonitor.windowedFreshness(batch).collect()
    assert(out.length == 1 && !out.head.getAs[Boolean]("sla_breach"))
  }

  test("dedupedStream drops replayed event ids across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = FreshnessMonitor.dedupedStream(
      input.toDF().toDF("event_id", "ts"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      // replay id 1 within the watermark window + a fresh id
      input.addData((1L, ts("2024-01-01 10:01:00")), (3L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // id 1 exactly once
    } finally q.stop()
  }

  test("EP3 end-to-end: file-source stream over the real events parquet") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-stream sources read directories; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.checks.CheckDsl.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir.toString)).select("ts")
    val q = FreshnessMonitor
      .windowedFreshness(stream, windowLen = "1 day", watermark = "1 hour",
        slaMinutes = 120L)
      .writeStream.format("memory").queryName("file_freshness")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      // append mode emits only watermark-closed windows: all but the last
      // day of the ~30-day event range
      val n = spark.table("file_freshness").count()
      assert(n >= 25, s"expected ~29 closed daily windows, got $n")
    } finally q.stop()
  }

  test("freshnessTransitions (flatMapGroupsWithState) emits fresh/stale flips only") {
    implicit val sc = spark.sqlContext
    import graft.streaming.{AssetEvent, FreshnessTransition}
    val input = MemoryStream[(String, Timestamp)]
    val transitions = FreshnessMonitor.freshnessTransitions(
      input.toDF().toDF("asset", "ts").as[AssetEvent],
      slaMs = 30L * 60 * 1000, watermark = "10 minutes")
    val q = transitions.writeStream.format("memory").queryName("fresh_trans")
      .outputMode(OutputMode.Update()).start()
    try {
      def rows() = spark.table("fresh_trans").as[FreshnessTransition]
        .collect().map(t => (t.asset, t.latest_ts.toString, t.fresh)).toSeq

      input.addData(("a", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(rows() == Seq(("a", "2024-01-01 10:00:00.0", true)))

      // still fresh: another a-event produces NO new transition
      input.addData(("a", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(rows().count(_._1 == "a") == 1)

      // b-events advance the watermark past a's 10:35 SLA deadline ->
      // a flips stale (timeout), b announces fresh
      input.addData(("b", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(("b", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val afterStale = rows()
      assert(afterStale.contains(("a", "2024-01-01 10:05:00.0", false)))
      assert(afterStale.count(_._1 == "b") == 1)

      // recovery: a fresh again on its next event
      input.addData(("a", ts("2024-01-01 11:40:00")))
      q.processAllAvailable()
      assert(rows().contains(("a", "2024-01-01 11:40:00.0", true)))
      assert(rows().count(_._1 == "a") == 3) // fresh, stale, fresh — no echoes
    } finally q.stop()
  }

  test("freshness_transitions_stream check emits exactly the oracle's transition set") {
    // the driver-visible streaming entry (StreamTier): a real micro-batch
    // run over the fixed fixture must produce the same 7 transitions the
    // DuckDB oracle derives from the event-time rules
    def its(iso: String) = Timestamp.from(java.time.Instant.parse(iso))
    val out = graft.checks.StreamTier.freshnessTransitionsStream.run(spark, sf)
      .as[(String, Timestamp, Boolean)].collect().toSeq
    val expected = Seq(
      ("A", its("2024-01-01T10:00:00Z"), false),
      ("A", its("2024-01-01T10:00:00Z"), true),
      ("A", its("2024-01-01T11:50:00Z"), false),
      ("A", its("2024-01-01T11:50:00Z"), true),
      ("B", its("2024-01-01T10:05:00Z"), true),
      ("B", its("2024-01-01T11:30:00Z"), false),
      ("C", its("2024-01-01T13:00:00Z"), true))
    assert(out == expected, s"got: ${out.mkString(", ")}")
  }

  test("freshnessTransitions batch-mode parity: one initial row per asset") {
    import graft.streaming.AssetEvent
    val batch = Seq(("x", ts("2024-01-01 10:00:00")),
      ("x", ts("2024-01-01 10:30:00")), ("y", ts("2024-01-01 09:00:00")))
      .toDF("asset", "ts").as[AssetEvent]
    val out = FreshnessMonitor.freshnessTransitions(batch).collect()
      .map(t => t.asset -> ((t.latest_ts.toString, t.fresh))).toMap
    assert(out == Map(
      "x" -> (("2024-01-01 10:30:00.0", true)),
      "y" -> (("2024-01-01 09:00:00.0", true))))
  }

  test("sessionize groups by gap-separated session windows per user") {
    val batch = Seq(
      (7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:10:00")),
      (7L, ts("2024-01-01 12:00:00")), // > 30 min gap -> new session
      (8L, ts("2024-01-01 10:05:00"))
    ).toDF("user_id", "ts")
    val sessions = FreshnessMonitor.sessionize(batch).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      .sorted.toSeq
    assert(sessions == Seq((7L, 1L), (7L, 2L), (8L, 1L)))
  }

  test("stream-stream attribution join matches within-window conversions only") {
    implicit val sc = spark.sqlContext
    val trig = MemoryStream[(Long, Timestamp)]
    val conv = MemoryStream[(Long, Timestamp)]
    val joined = FreshnessMonitor.attributionJoin(
      trig.toDF().toDF("user_id", "ts"),
      conv.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      trig.addData((1L, ts("2024-01-01 10:00:00")), // converts at 10:05 ✓
        (2L, ts("2024-01-01 10:00:00")),            // converts at 10:20 ✗ (>10m)
        (3L, ts("2024-01-01 10:00:00")))            // never converts
      conv.addData((1L, ts("2024-01-01 10:05:00")),
        (2L, ts("2024-01-01 10:20:00")),
        (4L, ts("2024-01-01 10:05:00")))            // conversion w/o trigger
      q.processAllAvailable()
      // push both watermarks forward so buffered state flushes (the flush
      // rows themselves are 60 min apart -> outside the window, no match)
      trig.addData((99L, ts("2024-01-01 12:00:00")))
      conv.addData((99L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("user_id", "conversion_ts")
        .as[(Long, Timestamp)].collect().toSet
      assert(rows == Set((1L, ts("2024-01-01 10:05:00"))))
    } finally q.stop()
  }

  test("streaming ingest dedups each micro-batch against the static corpus index") {
    // the nightly-ingest shape as a STREAM: foreachBatch runs the
    // incremental matcher (MinHashLsh.nearDupPairsAgainst) per micro-batch
    // against a persisted corpus shingle set — the streaming face of the
    // stored-signature index; state never grows with the stream
    implicit val sc = spark.sqlContext
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, explode}
    import graft.substrate.{MinHashLsh, TextOps}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    def sh(df: DataFrame) = df.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    val indexSide = sh(corpus).persist()
    val found = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MinHashLsh.nearDupPairsAgainst(sh(batch), indexSide,
            numPerms = 8, bandRows = 2, threshold = 0.5)
          .select("a", "b").as[(Long, Long)].collect()
          .foreach(p => found.add(p))
        ()
      }
      .start()
    try {
      input.addData((101L, "beta gamma delta epsilon zeta eta theta"), // ~doc 1
        (102L, "unrelated totally different words appear here now"))
      q.processAllAvailable()
      input.addData((201L, "one two three four five six seven eight")) // ~doc 2
      q.processAllAvailable()
      assert(found.asScala.toSet == Set((101L, 1L), (201L, 2L)))
    } finally { q.stop(); indexSide.unpersist() }
  }

  test("attribution join: streaming output equals the batch mirror row-for-row") {
    implicit val sc = spark.sqlContext
    // deliberately includes an exact-boundary pair (10:00 -> 10:10 = window
    // edge, kept by <=), a just-outside pair, multi-trigger attribution
    // (two views both claim the 10:12 purchase), and an unrelated user
    val trigRows = Seq((1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:08:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (5L, ts("2024-01-01 10:00:00")))
    val convRows = Seq((1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 10:12:00")),
      (2L, ts("2024-01-01 10:10:01")), // 1s past the 10-minute window
      (6L, ts("2024-01-01 10:05:00")))
    val trig = MemoryStream[(Long, Timestamp)]
    val conv = MemoryStream[(Long, Timestamp)]
    val joined = FreshnessMonitor.attributionJoin(
      trig.toDF().toDF("user_id", "ts"),
      conv.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("attrib_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      trig.addData(trigRows: _*)
      conv.addData(convRows: _*)
      q.processAllAvailable()
      trig.addData((99L, ts("2024-01-01 12:00:00")))
      conv.addData((99L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("attrib_parity")
        .select("user_id", "trigger_ts", "conversion_ts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      // the BATCH mirror is the same function over plain DataFrames — the
      // shape attribution_join's DuckDB oracle checks (flush rows included:
      // 12:00 -> 13:00 is outside the window in batch too)
      val batch = FreshnessMonitor.attributionJoin(
          (trigRows :+ (99L, ts("2024-01-01 12:00:00"))).toDF("user_id", "ts"),
          (convRows :+ (99L, ts("2024-01-01 13:00:00"))).toDF("user_id", "ts"))
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(batch.map(t => (t._1, t._3.toString)) ==
        Set((1L, "2024-01-01 10:10:00.0"), (1L, "2024-01-01 10:12:00.0")))
    } finally q.stop()
  }

  test("left-outer attribution emits unconverted triggers after the watermark") {
    implicit val sc = spark.sqlContext
    val trig = MemoryStream[(Long, Timestamp)]
    val conv = MemoryStream[(Long, Timestamp)]
    val joined = FreshnessMonitor.attributionJoin(
      trig.toDF().toDF("user_id", "ts"),
      conv.toDF().toDF("user_id", "ts"), leftOuter = true)
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      trig.addData((1L, ts("2024-01-01 10:00:00")),  // converts
        (3L, ts("2024-01-01 10:00:00")))             // never converts
      conv.addData((1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      trig.addData((99L, ts("2024-01-01 12:00:00")))
      conv.addData((98L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("user_id", "conversion_ts")
        .as[(Long, Option[Timestamp])].collect().toSet
      // user 1 matched; user 3's trigger released with a NULL conversion
      // once the conversion watermark passed its window
      assert(rows == Set((1L, Some(ts("2024-01-01 10:05:00"))),
        (3L, None)))
    } finally q.stop()
  }
}
