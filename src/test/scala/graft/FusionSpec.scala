package graft

import org.apache.spark.sql.functions._

import graft.substrate.{Fusion, InvertedIndex}

/** Hybrid-retrieval substrate: RRF arithmetic and ordering, and the
  * per-query BM25 batch variant's equivalence to the single-query ranker.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: both-list docs score 1/(60+r1) + 1/(60+r2) and outrank single-list docs") {
    // query 7: doc 100 is rank 1 in BOTH lists; doc 200 lexical-only
    // rank 2; doc 300 semantic-only rank 2
    val lex = Seq((7L, 1L, 100L), (7L, 2L, 200L)).toDF("qid", "rank", "doc_id")
    val sem = Seq((7L, 1L, 100L), (7L, 2L, 300L)).toDF("qid", "rank", "doc_id")
    val out = Fusion.rrf(Seq(lex, sem))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((1L, 100L), (2L, 200L), (3L, 300L)))
    val byDoc = out.map(r => r._3 -> r._4).toMap
    assert(math.abs(byDoc(100L) - (1.0 / 61 + 1.0 / 61)) < 1e-15)
    assert(math.abs(byDoc(200L) - 1.0 / 62) < 1e-15)
    assert(math.abs(byDoc(300L) - 1.0 / 62) < 1e-15)
    // equal-score tie (200 vs 300) broke by doc_id asc
  }

  test("rrf: a consistently-mid doc beats a one-list-top doc only when RRF says so; topK truncates per query") {
    // rank 1 in one list (1/61 ≈ .01639) vs rank 2 in both (2/62 ≈ .03226)
    val l1 = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 30L)).toDF("qid", "rank", "doc_id")
    val l2 = Seq((1L, 2L, 20L), (1L, 3L, 40L), (2L, 1L, 30L)).toDF("qid", "rank", "doc_id")
    val out = Fusion.rrf(Seq(l1, l2), topK = 2)
      .as[(Long, Long, Long, Double)].collect()
    val q1 = out.filter(_._1 == 1L).sortBy(_._2).map(r => (r._2, r._3)).toSeq
    assert(q1 == Seq((1L, 20L), (2L, 10L)), s"got $q1") // 2/62 > 1/61
    assert(out.count(_._1 == 1L) == 2) // doc 40 truncated by topK=2
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._3)).toSeq ==
      Seq((1L, 30L)))
  }

  private val corpus = Seq(
    (1L, "red fox jumps red"),
    (2L, "red dog sleeps"),
    (3L, "red fox sleeps quietly"),
    (4L, "blue whale")).toDF("doc_id", "text")

  test("rankBm25PerQuery == rankBm25 for a single query; excludeSelf drops the query doc pre-ranking") {
    val idx = InvertedIndex.buildWithTf(corpus, "doc_id", "text")
    val lens = corpus.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))
    val terms = Seq("red", "fox").toDF("token")
    val single = InvertedIndex.rankBm25(idx, lens, terms)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val batch = InvertedIndex.rankBm25PerQuery(idx, lens,
        Seq((9L, "red"), (9L, "fox")).toDF("qid", "token"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(single.map(r => (r._2, r._3)).toSeq ==
      batch.map(r => (r._3, r._4)).toSeq,
      s"single=$single batch=$batch")
    // self-exclusion: qid = doc 1 with its own terms; doc 1 must vanish
    // and the remaining ranks re-number from 1
    val self = InvertedIndex.rankBm25PerQuery(idx, lens,
        Seq((1L, "red"), (1L, "fox")).toDF("qid", "token"),
        excludeSelf = true)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(!self.exists(_._3 == 1L), s"self not excluded: ${self.toSeq}")
    assert(self.map(_._2).toSeq == (1L to self.length).toSeq)
    val withSelf = InvertedIndex.rankBm25PerQuery(idx, lens,
        Seq((1L, "red"), (1L, "fox")).toDF("qid", "token"))
      .as[(Long, Long, Long, Double)].collect()
    assert(withSelf.exists(_._3 == 1L))
  }
}
