package graft.substrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded MinHash LSH near-duplicate detection in pure DataFrame algebra
  * (shingle → minhash signature → band → bucket-join → exact-verify), the
  * V-SMART-Join-lineage scale path (PAPERS.md): candidate generation is
  * sub-quadratic — only docs agreeing on an entire band of minhashes meet,
  * and the exact Jaccard verification runs on candidates only.
  *
  * Deterministic: permutation p's hash is xxhash64(shingle, p) with Spark's
  * fixed xxhash64 seed; no fitted model, no randomness.
  *
  * Cost shape at 100 TB: one shuffle to group shingles per doc (signature
  * agg), one shuffle per band-bucket join keyed on (band, bucket) — skew
  * capped because a bucket only collects docs with identical band
  * signatures — and a candidate-sized verify join. Never all-pairs.
  *
  * With bandRows=2, numPerms=12 (6 bands): P(candidate | J=0.5) = 0.82,
  * P(candidate | J=0.2) = 0.21 — the standard S-curve for a 0.5 threshold.
  */
object MinHashLsh {

  /** @param shingles (doc_id, shingle) rows, distinct per doc.
    * @return (a, b, jaccard) near-dup pairs with exact Jaccard ≥ threshold.
    *
    * Caching contract: the operator is EAGER — it materializes the (small,
    * candidate-bounded) pair set via localCheckpoint and releases its
    * intermediate caches before returning, so library callers don't
    * accumulate cached shingle/signature blocks (they'd otherwise only be
    * freed by an explicit clearCache()).
    */
  /** Permutation hash: default xxhash64 (codegen'd, the fast scale path);
    * swap in `portableHash` when the signature must be reproducible in
    * engines without xxhash64 (the DuckDB oracle).
    */
  val defaultHash: (Column, Int) => Column = (c, p) => xxhash64(c, lit(p))

  /** md5-based permutation hash — string min, byte-identical cross-engine
    * (`md5(shingle || ':' || perm)`), ~2-3x slower than xxhash64.
    */
  val portableHash: (Column, Int) => Column =
    (c, p) => md5(concat(c, lit(":" + p)).cast("binary"))

  val defaultBandKey: Seq[Column] => Column = cols => hash(cols: _*)

  /** Cross-engine band key: md5 of the '|'-joined band signature. */
  val portableBandKey: Seq[Column] => Column =
    cols => md5(concat_ws("|", cols: _*).cast("binary"))

  def nearDupPairs(shingles: DataFrame, numPerms: Int = 12, bandRows: Int = 2,
      threshold: Double = 0.5,
      hashFn: (Column, Int) => Column = defaultHash,
      bandKeyFn: Seq[Column] => Column = defaultBandKey): DataFrame = {
    require(numPerms % bandRows == 0, "bands must tile the signature")
    // The shingle set feeds four consumers (signatures+sizes, two sides of
    // the verify join). Shingling is an expensive interpreted HOF pass over
    // the corpus — persist so it's computed ONCE per action, not 4x
    // (measured 5x end-to-end on the sweep bench). Persist only if the
    // caller hasn't already (so we never unpersist a cache we don't own).
    val weOwnCache = shingles.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    val sh = if (weOwnCache) shingles.persist() else shingles

    // one aggregation pass: the minhashes + the set size together
    val sigCols = (0 until numPerms)
      .map(p => min(hashFn(col("shingle"), p)).as(s"m$p")) :+
      count(lit(1)).as("n")
    val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*).persist()

    val nBands = numPerms / bandRows
    val banded = (0 until nBands).map { b =>
      val cols = (b * bandRows until (b + 1) * bandRows).map(i => col(s"m$i"))
      sigs.select(col("doc_id"), lit(b).as("band"), bandKeyFn(cols).as("bkey"))
    }.reduce(_ unionAll _)

    val candidates = banded.select(col("band"), col("bkey"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b")),
        Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()

    // exact Jaccard, candidates only
    val inter = candidates
      .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("doc_id").as("b2"), col("shingle").as("sh2")),
        col("b") === col("b2") && col("shingle") === col("sh2"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val pairs = candidates.join(inter, Seq("a", "b"), "left")
      .join(sigs.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true) // eager: compute pairs, then free the caches
    if (weOwnCache) sh.unpersist(false)
    sigs.unpersist(false)
    pairs
  }
}
