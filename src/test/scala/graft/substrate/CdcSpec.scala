package graft.substrate

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** CDC merge semantics: latest-seq wins, deletes drop keys,
  * delete-then-reinsert resurrects, untouched base rows pass through —
  * and the plan folds via hash aggregation (partial-agg-able), not a
  * window sort.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L),
    (2L, "b", 20L),
    (3L, "c", 30L),
    (4L, "d", 40L)
  ).toDF("k", "s", "v")

  private val changes = Seq(
    (2L, "b2", 21L, "U", 1L),   // update
    (3L, "c", 30L, "D", 1L),    // delete
    (4L, "dX", 99L, "U", 1L),   // superseded by seq=2 below
    (4L, "d2", 41L, "U", 2L),   // latest wins
    (5L, "e", 50L, "I", 1L),    // insert (new key)
    (6L, "f", 60L, "I", 1L),    // insert then delete → absent
    (6L, "f", 60L, "D", 2L),
    (7L, "g", 70L, "D", 1L),    // delete then re-insert → present
    (7L, "g2", 71L, "I", 2L)
  ).toDF("k", "s", "v", "op", "seq")

  test("latest change wins; deletes drop; re-insert resurrects") {
    val out = Cdc.applyChangeLog(base, changes, Seq("k"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "a", 10L),    // untouched base
      (2L, "b2", 21L),   // updated
      (4L, "d2", 41L),   // seq=2 beat seq=1
      (5L, "e", 50L),    // inserted
      (7L, "g2", 71L)))  // delete@1 then insert@2
  }

  test("merged schema equals the base schema") {
    val out = Cdc.applyChangeLog(base, changes, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "s", "v"))
  }

  test("plans with map-side partial aggregation and no window sort") {
    val plan = Cdc.applyChangeLog(base, changes, Seq("k"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the scale property: deltas fold BEFORE the shuffle (partial_max_by
    // upstream of the exchange), and no per-key window sort materializes
    // every version of a hot key in one partition
    assert(plan.contains("partial_max_by"),
      s"CDC merge lost map-side partial aggregation:\n$plan")
    val exchanges = "Exchange \\(\\d+\\)".r.findAllIn(plan).toSet
    assert(exchanges.size == 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Window"), s"window sort in CDC merge:\n$plan")
  }
}
