package graft

import org.apache.spark.sql.functions._

import graft.substrate.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "red fox jumps"),
    (2L, "red dog sleeps"),
    (3L, "red fox sleeps quietly"),
    (4L, "blue whale")).toDF("doc_id", "text")

  test("build: df and sorted distinct postings per token") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
      .select(col("token"), col("df"),
        concat_ws(",", col("postings").cast("array<string>")).as("p"))
      .as[(String, Long, String)].collect()
      .map { case (t, d, p) => t -> ((d, p)) }.toMap
    assert(idx("red") == ((3L, "1,2,3")))
    assert(idx("fox") == ((2L, "1,3")))
    assert(idx("sleeps") == ((2L, "2,3")))
    assert(idx("whale") == ((1L, "4")))
    assert(idx.size == 8) // red fox jumps dog sleeps quietly blue whale
  }

  test("build: within-doc token repeats do not inflate df or postings") {
    val rep = Seq((1L, "a a a b"), (2L, "b b")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(rep, "doc_id", "text")
      .select(col("token"), col("df"), size(col("postings")).as("np"))
      .as[(String, Long, Int)].collect().map {
        case (t, d, n) => t -> ((d, n)) }.toMap
    assert(idx("a") == ((1L, 1)))
    assert(idx("b") == ((2L, 2)))
  }

  test("lookupAll: conjunctive intersection, empty when nothing matches all") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
    def hits(ts: String*) =
      InvertedIndex.lookupAll(idx, ts.toDF("token"))
        .as[Long].collect().toSet
    assert(hits("red", "fox") == Set(1L, 3L))
    assert(hits("red", "fox", "sleeps") == Set(3L))
    assert(hits("red") == Set(1L, 2L, 3L))
    assert(hits("fox", "whale") == Set.empty[Long])
    // duplicate query terms must not double-count an intersection
    assert(hits("red", "red", "fox") == Set(1L, 3L))
  }

  test("rankBm25: tf raises score at equal length; rarer terms outweigh common") {
    // 4 docs, equal length 4; "fox" df=4 (common), "owl" df=1 (rare)
    val c = Seq(
      (1L, "fox fox pad pad"), // tf(fox)=2
      (2L, "fox pad pad pad"), // tf(fox)=1
      (3L, "fox owl pad pad"), // tf(fox)=1 + rare owl
      (4L, "fox pad mat mat")).toDF("doc_id", "text")
    val idx = InvertedIndex.buildWithTf(c, "doc_id", "text")
    val lens = c.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))
    val ranked = InvertedIndex
      .rankBm25(idx, lens, Seq("fox", "owl").toDF("token"), topK = 4)
      .select("rank", "doc_id").as[(Long, Long)].collect().toMap
        .map(_.swap)
    // doc 3 (rare term) wins; doc 1 (tf=2 on the common term) beats the
    // single-occurrence docs 2 and 4; ranks are contiguous 1..4
    assert(ranked(3L) == 1L, s"rare-term doc should rank first: $ranked")
    assert(ranked(1L) == 2L, s"tf=2 doc should rank second: $ranked")
    assert(Set(ranked(2L), ranked(4L)) == Set(3L, 4L))
  }

  test("randomized: lookupAll == brute-force containment filter (3 seeds)") {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    for (seed <- Seq(11, 23, 59)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1L to 60L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val idx = InvertedIndex.build(df, "doc_id", "text")
      val qs = Seq(Seq("ant"), Seq("bee", "cat"), Seq("dog", "elk", "fox"))
      for (q <- qs) {
        val got = InvertedIndex.lookupAll(idx, q.toDF("token"))
          .as[Long].collect().toSet
        val want = corpus.filter { case (_, t) =>
          val toks = t.split(" ").toSet; q.forall(toks.contains)
        }.map(_._1).toSet
        assert(got == want, s"seed $seed terms $q: $got != $want")
      }
    }
  }

  test("lookup answers from the index alone (no corpus re-scan in the plan)") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
      .localCheckpoint(true) // sever lineage: the lookup can ONLY see the index
    val got = InvertedIndex.lookupAll(idx, Seq("red", "sleeps").toDF("token"))
      .as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}
