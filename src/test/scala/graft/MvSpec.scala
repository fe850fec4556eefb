package graft

import org.apache.spark.sql.functions._

import graft.substrate.MaterializedView

/** Incremental MV maintenance ≡ full recompute, in-engine (the registry
  * entry `mv_incremental_refresh` pins the same equivalence cross-engine
  * against the DuckDB full-recompute oracle).
  */
class MvSpec extends SparkSpec {
  import spark.implicits._

  private def mvOf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("k", "g0", "v")
      .groupBy(col("g0").as("g"))
      .agg(count(lit(1)).cast("long").as("n"), sum("v").cast("long").as("s"))

  private def result(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "n", "s").as[(String, Long, Long)].collect().toSet

  test("update / delete / insert / group-move fold into the right deltas") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
    val mv = mvOf(base)
    val chg = Seq[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)](
      // k=1: value update within group a: 10 -> 15
      (1L, Some("a"), Some(10L), Some("a"), Some(15L), 1L),
      // k=3: group move b -> a with value 30 -> 35
      (3L, Some("b"), Some(30L), Some("a"), Some(35L), 1L),
      // k=4: delete (group b drops to zero rows and must vanish)
      (4L, Some("b"), Some(40L), None, None, 1L),
      // k=9: insert into new group c
      (9L, None, None, Some("c"), Some(7L), 1L))
      .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
    val got = result(MaterializedView.refreshSumCount(mv, chg, Seq("k")))
    // final state: a = {1->15, 2->20, 3->35}, c = {9->7}; b gone
    assert(got == Set(("a", 3L, 70L), ("c", 1L, 7L)))
  }

  test("multi-change chains per key fold to first-before/last-after") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L))
    val mv = mvOf(base)
    val chg = Seq[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)](
      // k=1 chain: a/10 -> b/11 (seq 1) -> c/12 (seq 2): net -a/10 +c/12
      (1L, Some("a"), Some(10L), Some("b"), Some(11L), 1L),
      (1L, Some("b"), Some(11L), Some("c"), Some(12L), 2L),
      // k=2 chain: update then delete: net -a/20 only
      (2L, Some("a"), Some(20L), Some("a"), Some(25L), 1L),
      (2L, Some("a"), Some(25L), None, None, 2L))
      .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
    val got = result(MaterializedView.refreshSumCount(mv, chg, Seq("k")))
    assert(got == Set(("c", 1L, 12L)))
  }

  test("randomized changelogs: refresh == full recompute (200 keys, seeds)") {
    for (seed <- Seq(7, 41, 99)) {
      val rnd = new scala.util.Random(seed)
      val groups = Vector("a", "b", "c", "d")
      val base = (1L to 200L).map(k =>
        (k, groups(rnd.nextInt(groups.size)), rnd.nextInt(1000).toLong))
      val state = scala.collection.mutable.Map(
        base.map { case (k, g, v) => k -> (g, v) }: _*)
      val chgRows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Any, String, Any, Long)]
      var seq = 0L
      // random walk of updates/deletes/inserts, including chains
      for (_ <- 1 to 300) {
        seq += 1
        rnd.nextInt(3) match {
          case 0 => // update or re-group an existing key
            if (state.nonEmpty) {
              val k = state.keys.toVector(rnd.nextInt(state.size))
              val (bg, bv) = state(k)
              val ng = groups(rnd.nextInt(groups.size))
              val nv = rnd.nextInt(1000).toLong
              chgRows += ((k, bg, bv, ng, nv, seq))
              state(k) = (ng, nv)
            }
          case 1 => // delete
            if (state.nonEmpty) {
              val k = state.keys.toVector(rnd.nextInt(state.size))
              val (bg, bv) = state(k)
              chgRows += ((k, bg, bv, null, null, seq))
              state -= k
            }
          case 2 => // insert a fresh key (or re-insert a deleted one)
            val k = 1000L + rnd.nextInt(500)
            if (!state.contains(k)) {
              val g = groups(rnd.nextInt(groups.size))
              val v = rnd.nextInt(1000).toLong
              chgRows += ((k, null, null, g, v, seq))
              state(k) = (g, v)
            }
        }
      }
      val mv = mvOf(base)
      val chg = chgRows.toSeq
        .map { case (k, bg, bv, ag, av, s) =>
          (k, bg, Option(bv).map(_.asInstanceOf[Long]),
            ag, Option(av).map(_.asInstanceOf[Long]), s) }
        .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
      val got = result(MaterializedView.refreshSumCount(mv, chg, Seq("k")))
      val want = state.values.groupBy(_._1).map { case (g, vs) =>
        (g, vs.size.toLong, vs.map(_._2).sum) }.toSet
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("AVG face: avg == refreshed s/n exactly; groups track the fold") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
    val mv = mvOf(base)
    val chg = Seq[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)](
      (1L, Some("a"), Some(10L), Some("a"), Some(17L), 1L), // a: 10 -> 17
      (3L, Some("b"), Some(30L), None, None, 1L),           // b vanishes
      (9L, None, None, Some("c"), Some(5L), 1L))            // new group c
      .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
    val got = MaterializedView.refreshSumCountAvg(mv, chg, Seq("k"))
      .select("g", "n", "s", "avg")
      .as[(String, Long, Long, Double)].collect().toSet
    // avg is ONE double division over exactly-maintained longs — exact
    assert(got == Set(("a", 2L, 37L, 18.5), ("c", 1L, 5L, 5.0)))
  }

  test("MIN/MAX face: touched groups re-aggregate from base, untouched pass through, vanished drop") {
    val mv = Seq(("a", 1L, 9L), ("b", 5L, 8L), ("c", 2L, 2L))
      .toDF("g", "mn", "mx")
    // POST-change base: a's max row (9) was deleted — the eviction the
    // delta fold can't price; b untouched; c's only row moved to d
    val post = Seq(("a", 1L), ("a", 4L), ("b", 5L), ("b", 8L), ("d", 7L))
      .toDF("g", "v")
    val chg = Seq[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)](
      (1L, Some("a"), Some(9L), None, None, 1L),          // delete a/9
      (2L, Some("c"), Some(2L), Some("d"), Some(7L), 1L)) // move c -> d
      .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
    val got = MaterializedView.refreshMinMax(mv, post, chg)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 4L), ("b", 5L, 8L), ("d", 7L, 7L)))
  }
}
