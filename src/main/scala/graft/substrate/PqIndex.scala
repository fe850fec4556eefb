package graft.substrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression path
  * for embedding similarity at corpus scale (`factors/2-consumable.md`'s
  * vector-retrieval tier beside BrpLsh/IvfIndex): each vector is split
  * into `m` subspaces of `dim/m` dims, each subvector is quantized to the
  * nearest of `k` per-subspace centroids, and the stored artifact is the
  * m-byte code array — 64 doubles (512 B) become 8 small ints, a ~64×
  * working-set cut, which is what lets a 100 TB embedding corpus be
  * SCANNED for candidates from memory instead of disk.
  *
  * Everything is deterministic and mirrored in the `ann_pq_topk` DuckDB
  * oracle: seeds = the subvectors of the `k` smallest vec_ids; training =
  * ONE Lloyd update (assign the `trainMod`-sample to nearest seed with
  * (distance, cid) tie-break, mean per cell, empty cells keep their
  * seed); the approximation is deterministic arithmetic, not fuzzy.
  *
  * Scale shape: training touches only the O(n/trainMod) sample (one
  * broadcast-seeds pass + a per-dim mean); the codebook is m·k
  * subvectors (bounded — collected to the driver like BrpLsh's nTables
  * rows, never O(n)); ENCODING is a pure map-side projection against
  * literal centroid arrays — no shuffle, no join, whole-stage codegen'd
  * native ArraySqDist per (subspace, centroid) — so it pipelines into
  * the parquet scan at any corpus size (PlanQualitySpec gates the
  * no-Exchange plan; ScaleRehearsal measures ~0 shuffle across three
  * decades). ADC queries broadcast a per-query lookup table of
  * m·k precomputed subspace distances and scan the CODES, never the
  * vectors: per-candidate cost is m array lookups + adds.
  */
object PqIndex {

  val DefaultSubspaces = 8
  val DefaultCodebookK = 16
  val DefaultTrainMod = 5

  private def subvecs(v: Column, dim: Int, m: Int): Column = {
    val sd = dim / m
    posexplode(transform(sequence(lit(0), lit(m - 1)),
      s => slice(v, s * sd + 1, lit(sd))))
  }

  /** Train the per-subspace codebooks: (sub, cid, cv) with cv a
    * `dim/m`-dim centroid. Seeds are the subvectors of the k smallest
    * vec_ids (deterministic, SQL-mirrorable); one Lloyd update over the
    * `vec_id % trainMod == 0` sample refines them; cells the sample
    * never hits keep their seed subvector.
    */
  def codebooks(e: DataFrame, idCol: String, vCol: String, dim: Int,
      m: Int = DefaultSubspaces, k: Int = DefaultCodebookK,
      trainMod: Int = DefaultTrainMod): DataFrame = {
    val base = e.select(col(idCol).cast("long").as("vec_id"),
      col(vCol).as("v"))
    val seeds = base.orderBy("vec_id").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("vec_id"))
        .cast("long") - 1)
    val seedSubs = seeds.select(col("cid"),
        subvecs(col("v"), dim, m).as(Seq("sub", "sv")))
      .select(col("sub").cast("long").as("sub"), col("cid"), col("sv"))
    val trainSubs = base.filter(col("vec_id") % trainMod === 0)
      .select(col("vec_id"), subvecs(col("v"), dim, m).as(Seq("sub", "tv")))
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("tv"))
    val assigned = trainSubs.join(broadcast(seedSubs), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cid"), col("tv"),
        VectorOps.sqDist(col("tv"), col("sv")).as("d2"))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("cid"), col("tv")),
        struct(col("d2"), col("cid"))).as("best"))
      .select(col("sub"), col("best.cid").as("cid"), col("best.tv").as("tv"))
    val means = assigned
      .select(col("sub"), col("cid"),
        posexplode(col("tv")).as(Seq("j", "x")))
      .groupBy("sub", "cid", "j").agg(avg("x").as("xm"))
      .groupBy("sub", "cid")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("xm")))),
        p => p("xm")).as("cv"))
    seedSubs.join(means, Seq("sub", "cid"), "left")
      .select(col("sub"), col("cid"),
        coalesce(col("cv"), col("sv")).as("cv"))
  }

  /** Collect the trained codebook to a driver-side array indexed
    * [sub][cid][j] — m·k subvectors, BOUNDED (m·k·dim/m = k·dim doubles;
    * 16·64 = 1 KB at the defaults), the same legitimate small-collect as
    * BrpLsh's nTables hyperplanes.
    */
  def codebookArrays(cb: DataFrame, m: Int = DefaultSubspaces,
      k: Int = DefaultCodebookK): Array[Array[Array[Double]]] = {
    val out = Array.ofDim[Array[Double]](m, k)
    cb.select(col("sub").cast("int"), col("cid").cast("int"), col("cv"))
      .collect().foreach { r =>
        out(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
    out
  }

  private def litVec(xs: Array[Double]): Column = array(xs.map(lit): _*)

  /** Per-subspace distance array to every centroid: array(sqDist(subvec,
    * cb[s][0]), ..., sqDist(subvec, cb[s][k-1])) — native codegen'd
    * ArraySqDist against LITERAL centroid vectors, all map-side. Shared
    * with [[IvfPq]]'s per-probe lookup tables.
    */
  private[substrate] def distsCol(v: Column, cb: Array[Array[Array[Double]]],
      s: Int, sd: Int): Column =
    array(cb(s).indices.map(c =>
      VectorOps.sqDist(slice(v, s * sd + 1, sd), litVec(cb(s)(c)))): _*)

  /** Encode the corpus: (vec_id, codes) with codes(s) = the 0-based index
    * of the nearest sub-centroid (ties → smallest cid via
    * array_position's first match of the min). A pure projection — no
    * join, no shuffle: the codebook rides in as literals.
    */
  def encode(e: DataFrame, idCol: String, vCol: String,
      cb: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val m = cb.length; val sd = dim / m
    e.select(col(idCol).cast("long").as("vec_id"),
        array((0 until m).map(s =>
          distsCol(col(vCol), cb, s, sd)): _*).as("dists"))
      .select(col("vec_id"),
        expr("transform(dists, ds -> int(array_position(ds, array_min(ds)) - 1))")
          .as("codes"))
  }

  /** ADC (asymmetric distance computation) top-k: each query precomputes
    * a [sub][cid] lookup table of exact subspace distances to the
    * codebook, broadcasts it, and scans the corpus CODES — approximate
    * distance = sum over subspaces of lut(s)(code(s)), m lookups + adds
    * per candidate, no vector arithmetic in the scan. Deterministic
    * (adist asc, cid asc) ranking; self-matches excluded. Output:
    * (qid, rank, cid).
    */
  def topK(codes: DataFrame, q: DataFrame, qidCol: String, qvCol: String,
      cb: Array[Array[Array[Double]]], dim: Int,
      topK: Int = 10): DataFrame = {
    val m = cb.length; val sd = dim / m
    val luts = q.select(col(qidCol).cast("long").as("qid"),
      array((0 until m).map(s =>
        distsCol(col(qvCol), cb, s, sd)): _*).as("luts"))
    val scored = codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr(s"aggregate(sequence(0, ${m - 1}), 0D, (acc, s) -> acc + luts[s][codes[s]])")
          .as("adist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("adist").asc, col("cid").asc))
        .cast("long"))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "cid")
  }

  val DefaultRerankDepth = 50

  /** Two-stage retrieval: ADC prefilter to `depth` candidates per query
    * ([[topK]]), then EXACT euclidean rerank of just those — the standard
    * production recovery for PQ's quantization error (Jégou et al. §V.C:
    * reranking with source vectors). The exact pass touches |Q|·depth
    * vectors fetched by an equi-join on vec_id (point lookups on a
    * stored vector table — bucket/partition-prunable), never the corpus:
    * the scan stays the m-lookup ADC code pass, and the expensive full
    * distance is paid only where it can change the answer.
    * Deterministic (d2 asc, cid asc) final ranking. Output:
    * (qid, rank, cid).
    */
  def topKReranked(codes: DataFrame, e: DataFrame, q: DataFrame,
      qidCol: String, qvCol: String, cb: Array[Array[Array[Double]]],
      dim: Int, depth: Int = DefaultRerankDepth, k: Int = 10): DataFrame =
    rerankExact(
      topK(codes, q, qidCol, qvCol, cb, dim, topK = depth)
        .select("qid", "cid"),
      e, q, qidCol, qvCol, k)

  /** Exact-euclidean rerank of a (qid, cid) candidate table — the
    * shared refine stage of [[topKReranked]] (full-ADC prefilter) and
    * the IVF-PQ composition's refine entry (probed-ADC prefilter,
    * `retrieval_recall_ivfpq_rerank`): fetch each candidate's vector by
    * an equi-join on vec_id (point lookups on a stored vector table),
    * broadcast the queries, compute |cand| true distances, rank
    * deterministically ((d2, cid) tie-break). Output: (qid, rank, cid).
    */
  def rerankExact(cand: DataFrame, e: DataFrame, q: DataFrame,
      qidCol: String, qvCol: String, k: Int): DataFrame = {
    val exact = cand
      .join(e.select(col("vec_id").as("cid"), col("v")), Seq("cid"))
      .join(broadcast(q.select(col(qidCol).cast("long").as("qid"),
        col(qvCol).as("qv"))), Seq("qid"))
      .select(col("qid"), col("cid"),
        VectorOps.sqDist(col("qv"), col("v")).as("d2"))
    exact.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cid").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
  }
}
