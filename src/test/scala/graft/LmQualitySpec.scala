package graft

/** Known-answer and signal-direction tests for the bigram-LM quality
  * scorer (TextTier.lmScore / lm_quality_score).
  */
class LmQualitySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one bigram nll on a 3-doc corpus") {
    // tokens: d0 = a b a b, d1 = a b, d2 = c c c; V = 3
    // c12: (a,b)=3 (b,a)=1 (c,c)=2; c1: a=3 b=1 c=2
    // P(a,b) = 4/6, P(b,a) = 2/4, P(c,c) = 3/5
    val d = Seq((0L, "a b a b"), (1L, "a b"), (2L, "c c c"))
      .toDF("doc_id", "text")
    val out = graft.checks.TextTier.lmScore(d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ln = (x: Double) => math.log(x)
    val expected = Map(
      0L -> (3L, -(2 * ln(4.0 / 6) + ln(2.0 / 4)) / 3),
      1L -> (1L, -ln(4.0 / 6)),
      2L -> (2L, -ln(3.0 / 5)))
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, (n, nll)) =>
      assert(out(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(out(id)._2 - nll) < 1e-12, s"doc $id nll: ${out(id)._2} vs $nll")
    }
  }

  test("one-token and empty docs are absent; fluent text scores below gibberish") {
    val fluent = (0L until 20L).map(i => (i, "the cat sat on the mat"))
    val odd = Seq((100L, "zq wv xk jj qp mm zz"), (200L, "solo"), (201L, ""))
    val out = graft.checks.TextTier.lmScore((fluent ++ odd).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!out.contains(200L) && !out.contains(201L),
      "docs with under 2 tokens have no bigrams")
    assert(out(0L) < out(100L),
      s"corpus-typical text must score lower nll than gibberish: ${out(0L)} vs ${out(100L)}")
  }

  test("sampled LM ranks track the full LM; unseen bigrams hit the smoothed floor") {
    // Rank stability where there IS a rank to keep: a planted-quality
    // corpus — doc i mixes a deterministic fluent chain with seeded
    // gibberish in proportion i/N, so the full LM's nll ordering follows
    // the planted noise level. The 20%-sample LM (the 100 TB
    // train-on-a-slice shape) must reproduce that ordering. (The sf
    // documents corpus is 31-token word salad whose full-LM ranking is
    // itself sampling noise — rho vs it measures the noise floor, not
    // the estimator, so the bar is pinned on the planted corpus.)
    val chain = Vector("alpha", "bravo", "cedar", "delta", "ember",
      "fjord", "grove", "haven", "inlet", "jetty")
    val rng = new scala.util.Random(42)
    val nDocs = 120; val len = 60
    val planted = (0 until nDocs).map { i =>
      val noise = i.toDouble / nDocs
      val toks = (0 until len).map { p =>
        if (rng.nextDouble() < noise) "g" + rng.nextInt(400) // gibberish tail
        else chain(p % chain.length) // fluent cycle: bigrams fully predictable
      }
      (i.toLong, toks.mkString(" "))
    }
    val d = planted.toDF("doc_id", "text")
    val full = graft.checks.TextTier.lmScore(d)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    val sampled = graft.checks.TextTier.lmScoreSampled(d)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(full.keySet == sampled.keySet,
      "both LMs must score exactly the >=2-token documents")
    // Spearman rank correlation
    def ranks(m: Map[Long, Double]): Map[Long, Double] =
      m.toSeq.sortBy(_._2).zipWithIndex
        .map { case ((id, _), r) => id -> r.toDouble }.toMap
    val rf = ranks(full); val rs = ranks(sampled)
    val n = rf.size.toDouble
    val d2 = rf.keys.map(k => math.pow(rf(k) - rs(k), 2)).sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    info(f"sampled-vs-full Spearman rho = $rho%.3f over ${rf.size} docs")
    assert(rho >= 0.8, s"sampled LM rank stability collapsed: rho = $rho")
    // and the ordering is the planted one, not an artifact both share
    val byNoise = planted.map(_._1).zipWithIndex
      .map { case (id, i) => id -> i.toDouble }.toMap
    val dq = rs.keys.map(k => math.pow(rs(k) - byNoise(k), 2)).sum
    val rhoQ = 1.0 - 6.0 * dq / (n * (n * n - 1.0))
    info(f"sampled-vs-planted-noise Spearman rho = $rhoQ%.3f")
    assert(rhoQ >= 0.8, s"sampled LM lost the planted quality signal: rho = $rhoQ")

    // the floor path is really exercised: a doc full of words the sample
    // never saw scores exactly ln(V) per bigram (p = 1/V)
    val probe = (0L until 10L).map(i => (i * 5, "the cat sat on the mat")) ++
      Seq((7L, "qzx wvv qzx wvv qzx"))
    val out = graft.checks.TextTier
      .lmScoreSampled(probe.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // sample vocab = {the, cat, sat, on, mat} (docs % 5 == 0), so doc 7's
    // bigrams are all unseen-head: nll = ln(V) = ln(5)
    assert(math.abs(out(7L) - math.log(5.0)) < 1e-12,
      s"unseen-head floor must be exactly ln(V): ${out(7L)} vs ${math.log(5.0)}")
  }
}
