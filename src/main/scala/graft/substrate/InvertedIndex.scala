package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token → posting-list inverted index — the data-level mechanism behind
  * requirement #10 `search_optimization` (reference
  * `factors/requirements.yaml:46-48`; "Search ... results in
  * milliseconds", `factors/2-consumable.md:9`): the check scores a catalog
  * flag, this builds the companion table the flag asserts exists, the way
  * BrpLsh/IvfIndex witness the vector-index requirements (#15/#19).
  *
  * Scale shape: `build` is one tokenize/explode pass + one groupBy(token)
  * shuffle — the same shuffle class as vocab_stats; trivially parallel at
  * 100 TB. The built index is meant to be STORED partitioned/bucketed by
  * token, so a term lookup reads only the matching token rows (predicate
  * pushdown on the bucket key), never the corpus — sub-scan access is the
  * entire point of the companion table. Stopword-grade tokens make long
  * posting lists (the classic skew hazard); `df` is materialized per row
  * precisely so a caller can route high-df terms to a segmented layout
  * (split postings by doc_id range) without rebuilding.
  */
object InvertedIndex {

  /** Build the index: (token, df, postings) with postings = the SORTED
    * distinct doc_ids containing the token and df = their count.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).cast("long").as("df"),
        sort_array(collect_list("doc_id")).as("postings"))

  /** TF-bearing index variant: (token, df, postings = doc_id-sorted array
    * of (doc_id, tf)) — the structure ranked retrieval reads. Same single
    * groupBy(token) shuffle as [[build]] after a (doc, token) partial agg.
    */
  def buildWithTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).cast("long").as("tf"))
      .groupBy("token")
      .agg(count(lit(1)).cast("long").as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))

  /** BM25 ranked retrieval (Robertson/Sparck-Jones, the Lucene-default
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf form) over a [[buildWithTf]] index
    * plus a doc-length norms table — the two stored artifacts a search
    * layer keeps beside the corpus. The plan explodes ONLY the query
    * terms' posting lists (index pruned by the broadcast term join), joins
    * norms by doc_id, and top-k's with a deterministic (score desc,
    * doc_id) tie-break. Output: (rank, doc_id, score).
    */
  def rankBm25(index: DataFrame, docLens: DataFrame, terms: DataFrame,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val t = terms.toDF("token").distinct()
    val stats = docLens.agg(count(lit(1)).cast("long").as("n_docs"),
      avg("dl").as("avgdl"))
    val posting = index.join(broadcast(t), Seq("token"))
      .select(col("df"), explode(col("postings")).as("p"))
      .select(col("df"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    val scored = posting
      .join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id").agg(sum("s").as("score"))
    import org.apache.spark.sql.expressions.Window
    scored
      .orderBy(col("score").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("rank", "doc_id", "score")
  }

  /** Conjunctive (AND) retrieval: doc_ids containing EVERY query term.
    * `terms` is a 1-column DataFrame of distinct tokens (broadcast — a
    * query's term set is always small). The plan touches only the index
    * rows matching the terms (an equi-join that prunes to the term
    * buckets on a stored index), explodes just those posting lists, and
    * intersects by counting: a doc hit by all |terms| lists qualifies.
    */
  def lookupAll(index: DataFrame, terms: DataFrame): DataFrame = {
    val t = terms.toDF("token").distinct()
    val nTerms = t.agg(count(lit(1)).as("n_terms"))
    index.join(broadcast(t), Seq("token"))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
      .join(broadcast(nTerms), col("hits") === col("n_terms"))
      .select("doc_id")
  }
}
