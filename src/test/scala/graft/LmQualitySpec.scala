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
}
