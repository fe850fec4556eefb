package graft

import org.apache.spark.sql.functions._

import graft.substrate.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("categoricalPsi: identical snapshots give ~zero contributions") {
    val obs = Seq("a", "a", "b", "c").toDF("k")
    val out = Drift.categoricalPsi(obs, obs, "k")
      .select("key", "contrib").as[(String, Double)].collect()
    assert(out.length == 3)
    assert(out.forall(r => math.abs(r._2) < 1e-15), s"${out.toSeq}")
  }

  test("categoricalPsi: smoothing keeps one-sided categories finite; movers carry positive contributions") {
    val ref = Seq("a", "a", "a", "b").toDF("k")
    val cur = Seq("a", "b", "c", "c").toDF("k")
    val rows = Drift.categoricalPsi(ref, cur, "k")
      .orderBy("key")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val byKey = rows.map(r => r._1 -> r).toMap
    assert(byKey("c")._2 == 0L && byKey("c")._3 == 2L)
    // union vocab = 3, totals 4 and 4: p = (n+1)/7
    assert(math.abs(byKey("c")._4 - 1.0 / 7) < 1e-15)
    assert(math.abs(byKey("c")._5 - 3.0 / 7) < 1e-15)
    // every contribution is finite and non-negative (the PSI term
    // (p2-p1)ln(p2/p1) is >= 0 for any p1,p2 > 0)
    assert(rows.forall(r => !r._6.isNaN && !r._6.isInfinite && r._6 >= 0))
    // the vanished-then-appeared categories are the top movers
    val top = rows.maxBy(_._6)._1
    assert(top == "a" || top == "c", s"unexpected top mover $top")
  }

  test("embeddingMeanShift: per-dim means and |shift| on known arrays") {
    val ref = Seq(Tuple1(Array(0.0, 2.0)), Tuple1(Array(2.0, 2.0))).toDF("v")
    val cur = Seq(Tuple1(Array(1.0, 0.0)), Tuple1(Array(3.0, 0.0))).toDF("v")
    val out = Drift.embeddingMeanShift(ref, cur, "v")
      .orderBy("dim").as[(Long, Double, Double, Double)].collect()
    assert(out.toSeq == Seq((0L, 1.0, 2.0, 1.0), (1L, 2.0, 0.0, 2.0)))
  }
  test("numericPsi: identical snapshots ~zero; a planted location shift concentrates mass in the top bin") {
    import spark.implicits._
    // deterministic values 0..199 with id ties for the edge selection
    val ref = (0L until 200L).map(i => (i, (i % 100).toDouble)).toDF("id", "x")
    val same = Drift.numericPsi(ref, ref, "x", "id", sampleMod = 2, nBins = 10)
      .collect()
    assert(same.nonEmpty)
    same.foreach(r => assert(math.abs(r.getAs[Double]("contrib")) < 1e-12))
    // bins stay in [0, nBins)
    same.foreach { r =>
      val b = r.getAs[Long]("key"); assert(b >= 0 && b < 10)
    }
    // location shift: every cur value beyond the reference range lands in
    // the TOP bin (edges are fixed from ref), and the PSI is clearly > 0
    val cur = ref.select(col("id"), (col("x") + 1000.0).as("x"))
    val shifted = Drift.numericPsi(ref, cur, "x", "id", sampleMod = 2, nBins = 10)
      .collect()
    val top = shifted.maxBy(_.getAs[Long]("key"))
    assert(top.getAs[Long]("key") == 9 && top.getAs[Long]("n_cur") == 200L)
    assert(shifted.map(_.getAs[Double]("contrib")).sum > 1.0)
  }
}
