package graft.substrate

import java.sql.Timestamp

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** Binned point-in-interval join: boundary inclusivity, multi-bucket
  * intervals, no-duplicate guarantee, and the plan shape that justifies
  * its existence (equi-join, not nested-loop).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, ts("2024-01-01 10:00:00")), // exactly at i1 start (inclusive)
    (2L, ts("2024-01-01 10:30:00")), // inside i1
    (3L, ts("2024-01-01 11:00:00")), // exactly at i1 end (inclusive)
    (4L, ts("2024-01-01 13:59:59")), // inside multi-bucket i2
    (5L, ts("2024-01-01 23:00:00"))  // matches nothing
  ).toDF("id", "p")

  private val intervals = Seq(
    ("i1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    ("i2", ts("2024-01-01 12:30:00"), ts("2024-01-01 15:30:00")), // 4 buckets
    ("i3", ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00"))  // overlaps i1
  ).toDF("name", "s", "e")

  test("inclusive boundaries, multi-bucket intervals, overlapping intervals") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "i1"), (2L, "i1"), (3L, "i1"), // boundaries in
      (2L, "i3"),                         // overlapping interval also matches
      (4L, "i2")))                        // bucket 13 of the 12:30-15:30 span
  }

  test("each (point, interval) pair appears exactly once (no bucket dups)") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == out.distinct.length)
  }

  test("interval overlap: touching, containing, disjoint, multi-bucket") {
    val lefts = Seq(
      ("L1", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      ("L2", ts("2024-01-01 20:00:00"), ts("2024-01-01 21:00:00"))
    ).toDF("lname", "ls", "le")
    val rights = Seq(
      ("R1", ts("2024-01-01 11:00:00"), ts("2024-01-01 15:00:00")), // overlaps L1
      ("R2", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // touches L1 end (inclusive)
      ("R3", ts("2024-01-01 09:00:00"), ts("2024-01-01 18:00:00")), // contains L1
      ("R4", ts("2024-01-01 22:00:00"), ts("2024-01-01 23:00:00"))  // disjoint
    ).toDF("rname", "rs", "re")
    val out = RangeJoin.intervalOverlap(lefts, "ls", "le", rights, "rs", "re")
      .select("lname", "rname").as[(String, String)].collect()
    assert(out.toSet == Set(("L1", "R1"), ("L1", "R2"), ("L1", "R3")))
    // multi-bucket overlaps must appear exactly once (canonical bucket)
    assert(out.length == out.distinct.length)
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    // force non-broadcast so the strategy choice is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"range join did not plan as an equi join:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested loop in range join:\n$plan")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
