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
}
