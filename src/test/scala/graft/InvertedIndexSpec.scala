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

  test("lookup answers from the index alone (no corpus re-scan in the plan)") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
      .localCheckpoint(true) // sever lineage: the lookup can ONLY see the index
    val got = InvertedIndex.lookupAll(idx, Seq("red", "sleeps").toDF("token"))
      .as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}
