package graft

import java.sql.Timestamp

import graft.substrate.AsOfJoin

/** SURVEY.md §7 hard part (a): as-of correctness under ties and
  * duplicates.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val right = Seq(
    (1L, ts("2024-01-10 00:00:00"), 10.0),
    (1L, ts("2024-01-15 00:00:00"), 15.0), // exactly AT the label ts
    (1L, ts("2024-01-20 00:00:00"), 20.0), // future -> never visible
    (2L, ts("2024-01-16 00:00:00"), 99.0), // only-future key
    (4L, ts("2024-01-01 00:00:00"), 1.0),
    (4L, ts("2024-01-01 00:00:00"), 2.0)   // duplicate ts (dup right rows)
  ).toDF("entity_id", "feature_ts", "value")

  private val left = Seq(
    (1L, ts("2024-01-15 00:00:00"), "a"),
    (2L, ts("2024-01-15 00:00:00"), "b"),
    (3L, ts("2024-01-15 00:00:00"), "c"), // no right rows at all
    (4L, ts("2024-01-15 00:00:00"), "d")
  ).toDF("entity_id", "label_ts", "label")

  private def run() = AsOfJoin.asofLeft(left, right, "entity_id",
    "label_ts", "feature_ts", Seq("value"))
    .collect().map(r => r.getAs[Long]("entity_id") ->
      ((Option(r.getAs[Timestamp]("asof_feature_ts")),
        Option(r.getAs[Any]("value"))))).toMap

  test("inclusive at equal timestamps; future rows invisible") {
    val out = run()
    assert(out(1L)._1.contains(ts("2024-01-15 00:00:00")))
    assert(out(1L)._2.contains(15.0))
  }

  test("left rows with only-future or no right rows survive with nulls") {
    val out = run()
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, None)))
    assert(run().size == 4) // all left rows preserved
  }

  test("null payload on the matched row stays null (no stale-value resurrection)") {
    val r = Seq(
      (9L, ts("2024-01-10 00:00:00"), Some(5.0)),
      (9L, ts("2024-01-12 00:00:00"), None) // matched row, null payload
    ).toDF("entity_id", "feature_ts", "value")
    val l = Seq((9L, ts("2024-01-15 00:00:00"), "z"))
      .toDF("entity_id", "label_ts", "label")
    val out = AsOfJoin.asofLeft(l, r, "entity_id", "label_ts", "feature_ts",
      Seq("value")).collect().head
    assert(out.getAs[Timestamp]("asof_feature_ts") == ts("2024-01-12 00:00:00"))
    assert(out.isNullAt(out.fieldIndex("value"))) // NOT the stale 5.0
  }

  test("a NULL right timestamp never matches (ASOF semantics)") {
    val r = Seq((9L, None: Option[Timestamp], 7.0),
      (9L, Some(ts("2024-01-10 00:00:00")), 1.0))
      .toDF("entity_id", "feature_ts", "value")
    val l = Seq((9L, ts("2024-01-15 00:00:00"), "z"))
      .toDF("entity_id", "label_ts", "label")
    val out = AsOfJoin.asofLeft(l, r, "entity_id", "label_ts", "feature_ts",
      Seq("value")).collect().head
    assert(out.getAs[Timestamp]("asof_feature_ts") == ts("2024-01-10 00:00:00"))
    assert(out.getAs[Double]("value") == 1.0) // never the null-ts row's 7.0
  }

  test("duplicate right timestamps resolve deterministically to one of them") {
    val out = run()
    assert(out(4L)._1.contains(ts("2024-01-01 00:00:00")))
    assert(Set(1.0, 2.0).contains(out(4L)._2.get.asInstanceOf[Double]))
    // and repeatedly the same one
    val again = run()
    assert(again(4L) == out(4L))
  }

  test("forward as-of: earliest at-or-after; past rows invisible") {
    val out = AsOfJoin.asofLeftForward(left, right, "entity_id",
      "label_ts", "feature_ts", Seq("value"))
      .collect().map(r => r.getAs[Long]("entity_id") ->
        ((Option(r.getAs[Timestamp]("asof_feature_ts")),
          Option(r.getAs[Any]("value"))))).toMap
    // entity 1: 01-15 row matches inclusively (not the 01-20 future one)
    assert(out(1L)._1.contains(ts("2024-01-15 00:00:00")) &&
      out(1L)._2.contains(15.0))
    // entity 2: only-future key now MATCHES its 01-16 row
    assert(out(2L)._1.contains(ts("2024-01-16 00:00:00")) &&
      out(2L)._2.contains(99.0))
    // entity 3: still no right rows -> nulls
    assert(out(3L)._1.isEmpty && out(3L)._2.isEmpty)
    // entity 4: both right rows are in the past -> nulls (direction flip)
    assert(out(4L)._1.isEmpty && out(4L)._2.isEmpty)
  }
}
