package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid retrieval — combining a lexical ranking
  * (BM25 over the inverted index) with a semantic ranking (ANN over the
  * embedding index) is how an AI-ready corpus actually serves search:
  * each retriever covers the other's misses (exact terms vs paraphrase).
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR 2009):
  * rrf(d) = Σ_lists 1/(k0 + rank_list(d)), k0 = 60 — rank-based, so no
  * cross-retriever score calibration is needed (BM25 scores and cosine
  * distances live on incomparable scales; ranks are dimensionless).
  *
  * Scale shape: inputs are ALREADY top-N rank lists (≤ N·|Q| rows each —
  * the retrievers did the corpus-scale work through their stored
  * indexes), so fusion is a union + one groupBy on (qid, doc_id) over
  * O(|lists|·N·|Q|) rows, independent of corpus size. The per-qid top-K
  * is a rank-window over ≤ |lists|·N candidates per query.
  */
object Fusion {

  val DefaultRrfK0 = 60

  /** Fuse rank lists, each shaped (qid, rank, doc_id) with ranks starting
    * at 1. Output: (qid, rank, doc_id, rrf) — the fused top-`topK` per
    * query, deterministic (rrf desc, doc_id asc) tie-break. A doc absent
    * from a list simply contributes nothing for it (the RRF convention:
    * missing rank → zero term, not a penalty).
    */
  def rrf(lists: Seq[DataFrame], k0: Int = DefaultRrfK0,
      topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one rank list")
    val contrib = lists.map(_.select(col("qid"), col("doc_id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank"))).as("c")))
      .reduce(_ unionByName _)
    contrib.groupBy("qid", "doc_id").agg(sum("c").as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "doc_id", "rrf")
  }
}
