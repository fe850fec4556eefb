package graft.substrate

import graft.SparkSpec

/** Diff classification incl. the null-safe comparison corners: null vs
  * value is `changed`, null vs null is `unchanged`.
  */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Option[String], Long)*) =
    rows.toDF("k", "s", "v")

  test("added / removed / changed / unchanged") {
    val oldV = df((1L, Some("a"), 1L), (2L, Some("b"), 2L),
      (3L, Some("c"), 3L), (4L, None, 4L), (5L, None, 5L))
    val newV = df((2L, Some("b"), 2L), (3L, Some("c9"), 3L),
      (4L, Some("now-set"), 4L), (5L, None, 5L), (6L, Some("new"), 6L))
    val out = TableDiff.byKey(oldV, newV, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "removed",
      2L -> "unchanged",
      3L -> "changed",     // value column differs
      4L -> "changed",     // null → value is a change
      5L -> "unchanged",   // null <=> null
      6L -> "added"))
  }

  test("mismatched schemas are rejected") {
    val oldV = df((1L, Some("a"), 1L))
    intercept[IllegalArgumentException] {
      TableDiff.byKey(oldV, oldV.withColumnRenamed("v", "w"), Seq("k"))
    }
  }
}
