package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.substrate.VectorOps._

/** IVF-flat approximate nearest neighbour — the second scale path for
  * similarity search (alongside LSH): partition the collection into
  * Voronoi cells around sampled centroids, search only the `nProbe`
  * closest cells per query.
  *
  * Centroids are a deterministic id-sample of the collection itself
  * (IVF quality comes from cell balance, not centroid optimality; a
  * seeded sample avoids k-means iterations and keeps the whole pipeline
  * reproducible and declarative).
  *
  * Scale shape: assignment is |N|×|C| dot-products with the native
  * codegen'd expression and the centroid set broadcast (no shuffle of the
  * collection); the probe join hits only nProbe/|C| of the data per query.
  * The cell-assigned table is the "index artifact" — at 100 TB it would be
  * written back partitioned BY cell so a probe prunes to nProbe partitions.
  */
object IvfIndex {

  private def centroids(e: DataFrame, centroidMod: Int): DataFrame =
    e.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))

  /** Assign every vector (vec_id, v) to its nearest centroid cell.
    * Argmin via `min_by` over a (d2, cent_id) struct, NOT a window rank:
    * the broadcast cross join leaves each vector's |C| candidate rows in
    * one partition, so partial aggregation collapses them map-side and the
    * exchange moves N rows — a rank window would shuffle all N×|C| rows.
    */
  def assign(e: DataFrame, centroidMod: Int): DataFrame = {
    val cents = centroids(e, centroidMod)
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cent_id"),
        sqDist(col("v"), col("cv")).as("d2"))
      .groupBy("vec_id")
      .agg(min_by(col("cent_id"), struct(col("d2"), col("cent_id"))).as("cell"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("cell"))
  }

  /** Coarse→fine two-level assignment — the 100 TB path for [[assign]].
    *
    * Flat assignment is |N|×|C| distance evaluations; with cell occupancy
    * held constant (|C| = n/centroidMod) that term is O(n²/centroidMod) —
    * a quadratic hiding inside the otherwise-linear cluster-scoped dedup.
    * Routing through a coarse codebook (every coarseFactor-th fine
    * centroid, |C|/coarseFactor cells) first cuts the per-vector work to
    * |C|/coarseFactor + nProbeCoarse·coarseFactor comparisons — minimized
    * at coarseFactor ≈ sqrt(|C|), the classic IVF-on-centroids shape.
    *
    * Probe discipline: each vector routes to its nProbeCoarse nearest
    * coarse cells, then exact-assigns among the fine centroids routed to
    * those cells. Coarse centroids are a SUBSET of fine centroids (the
    * coarse mod is a multiple of the fine mod), so every probed cell
    * holds at least its own centroid and assignment is total. A vector
    * whose true nearest fine centroid routed to an unprobed coarse cell
    * gets its best PROBED fine centroid instead — the documented
    * approximation (SemanticDedupSpec measures the agreement rate, and
    * nProbeCoarse ≥ |coarse| makes the result identical to [[assign]]).
    *
    * Shuffle shape: both codebooks broadcast; the top-w coarse probe is a
    * collect_list + array_sort per vector (the cross-join rows stay in
    * the producing partition, so partial aggregation collapses them
    * map-side and the exchange moves N rows — same discipline as
    * [[assign]]'s min_by).
    */
  def assignHier(e: DataFrame, centroidMod: Int, coarseFactor: Int,
      nProbeCoarse: Int): DataFrame = {
    val fine = centroids(e, centroidMod)
    val coarse = e.filter(col("vec_id") % (centroidMod * coarseFactor) === 0)
      .select(col("vec_id").as("co_id"), col("v").as("cov"))
    val routed = fine.crossJoin(broadcast(coarse))
      .select(col("cent_id"), col("cv"), col("co_id"),
        sqDist(col("cv"), col("cov")).as("d2"))
      .groupBy("cent_id")
      .agg(min_by(col("co_id"), struct(col("d2"), col("co_id"))).as("co_id"),
        first(col("cv")).as("cv"))
    val probes = e.crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("v"),
        struct(sqDist(col("v"), col("cov")).as("d2"), col("co_id")).as("sc"))
      .groupBy("vec_id")
      .agg(slice(array_sort(collect_list(col("sc"))), 1, nProbeCoarse).as("top"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), explode(col("top.co_id")).as("co_id"))
    probes.join(broadcast(routed), Seq("co_id"))
      .select(col("vec_id"), col("v"), col("cent_id"),
        sqDist(col("v"), col("cv")).as("d2"))
      .groupBy("vec_id")
      .agg(min_by(col("cent_id"), struct(col("d2"), col("cent_id"))).as("cell"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("cell"))
  }

  /** Approximate top-k: probe the nProbe nearest cells per query, exact
    * distance inside the probed cells only.
    */
  def topK(e: DataFrame, queries: DataFrame, centroidMod: Int, k: Int,
      nProbe: Int): DataFrame = {
    val indexed = assign(e, centroidMod)
    val cents = centroids(e, centroidMod)
    val wq = Window.partitionBy("qid").orderBy(col("qd2").asc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cent_id"),
        sqDist(col("qv"), col("cv")).as("qd2"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cent_id").as("cell"))
    val wk = Window.partitionBy("qid").orderBy(col("d2").asc, col("cid"))
    probes.join(indexed, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        sqDist(col("qv"), col("v")).as("d2"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
  }
}
