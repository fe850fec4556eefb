package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.substrate.VectorOps._

/** Deterministic multi-probe bucketed-random-projection LSH (euclidean
  * metric) — the third similarity-search path (alongside CosineSignLsh's
  * sign buckets and IvfIndex's Voronoi cells), and the in-house
  * replacement for MLlib's `BucketedRandomProjectionLSH` behind check #19
  * (reference `factors/requirements.yaml:82-84`): no fitted-model
  * artifact to version on the serving path, no engine-private RNG —
  * table t's projection is the same centered integer-hash plane family as
  * CosineSignLsh (offset by [[TableOffset]] so the two families are
  * independent), so every engine reproduces the buckets bit-for-bit and
  * the recall check gets a real DuckDB oracle (Datar et al.'s p-stable
  * scheme with a deterministic direction family).
  *
  * h_t(v) = floor(dot(v, w_t) / bucketLength). A query probes its own
  * bucket ± `probe` per table (standard multi-probe LSH): recall of a
  * single-projection table comes from widening the probe WINDOW, not the
  * buckets, so the candidate step stays a (table, bucket) equi-join —
  * the query side fans out 2·probe+1 rows, the corpus side shuffles once
  * on the bucket key. bucketLength is the recall/cost knob: distance
  * resolution is ~bucketLength per table, probe window covers
  * (2·probe+1)·bucketLength.
  *
  * Scale shape at 100 TB: bucket keys are one codegen'd map-side pass
  * (nTables dot products per row, no shuffle); the index artifact is the
  * (id, table, bucket) table, appendable per ingest batch like
  * MinHashLsh.signatures; candidates shuffle on (table, bucket) only.
  * On a corpus with genuine neighbor structure, shrink bucketLength so
  * buckets hold ~candidates-per-probe; this check's corpus is isotropic
  * background (its top-10 sits barely closer than random), so the check
  * runs a generous window to measure recall honestly rather than
  * pretending structure exists.
  */
object BrpLsh {

  /** Plane-family offset vs CosineSignLsh (which uses p ∈ [0, nPlanes)):
    * table t projects along weight(t + TableOffset, ·) — disjoint for any
    * realistic plane count, so sign-LSH and BRP buckets are independent.
    */
  val TableOffset = 1000

  /** Index defaults, named so the check #19 oracle CTEs interpolate the
    * SAME values the Spark path runs — tuning a knob here cannot silently
    * desync the two engines.
    */
  val DefaultTables = 6
  val DefaultBucketLength = 200000.0
  val DefaultProbe = 1

  def weight(t: Int, d: Int, dim: Int): Double =
    CosineSignLsh.weight(t + TableOffset, d, dim)

  def tables(nTables: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nTables).map(t => (0 until dim).map(d => weight(t, d, dim)))

  /** (id, tbl, bucket) index rows — the stored BRP index artifact. All
    * nTables buckets compute in ONE projection over ONE scan and unpivot
    * via explode (a unionAll of per-table projections would re-scan the
    * source once per table — nTables+1 corpus reads per search).
    */
  def bucketKeys(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nTables: Int, bucketLength: Double): DataFrame = {
    val ws = tables(nTables, dim)
    val kvs = (0 until nTables).map(t => struct(
      lit(t).as("tbl"),
      floor(VectorOps.dot(col(vecCol), typedLit(ws(t))) / bucketLength)
        .cast("long").as("bucket")))
    vecs.select(col(idCol), explode(array(kvs: _*)).as("kv"))
      .select(col(idCol), col("kv.tbl").as("tbl"), col("kv.bucket").as("bucket"))
  }

  /** Approximate euclidean top-k per query via the multi-probe bucket
    * join: candidates share a bucket within ± probe in ANY table; exact
    * squared distance reranks candidates only.
    *
    * @param e       (vec_id, v) collection
    * @param queries (qid, qv) query set
    * @return (qid, rank, cid), rank 1..k by exact distance.
    */
  def topK(e: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nTables: Int = DefaultTables,
      bucketLength: Double = DefaultBucketLength,
      probe: Int = DefaultProbe): DataFrame = {
    val corpusBuckets = bucketKeys(e, "vec_id", "v", dim, nTables, bucketLength)
    val qBuckets = bucketKeys(
      queries.select(col("qid").as("vec_id"), col("qv").as("v")),
      "vec_id", "v", dim, nTables, bucketLength)
      .select(col("vec_id").as("qid"), col("tbl"),
        explode(sequence(col("bucket") - probe, col("bucket") + probe))
          .as("bucket"))
    val cand = qBuckets
      .join(corpusBuckets.select(col("vec_id").as("cid"), col("tbl"),
        col("bucket")), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val wk = Window.partitionBy("qid").orderBy(col("d2").asc, col("cid"))
    cand
      .join(queries.select(col("qid"), col("qv")), Seq("qid"))
      .join(e.select(col("vec_id").as("cid"), col("v")), Seq("cid"))
      .select(col("qid"), col("cid"), sqDist(col("qv"), col("v")).as("d2"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
  }
}
