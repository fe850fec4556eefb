package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.substrate.CosineSignLsh

/** Per-shard sign-LSH (CosineSignLsh.nearDupPairsSharded): shard isolation,
  * planted-dup recall, the offsets-as-avg-of-dots identity, and the
  * mixed-corpus skew claim from SCALE.md (global centering cannot de-skew
  * subpopulations with distinct means; per-shard centering can) made into
  * an executable assertion.
  */
class ShardedLshSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic pseudo-random unit-ish vector for id i around a given
    * per-component mean.
    */
  private def vec(i: Long, mean: Double): Seq[Double] =
    (0 until Dim).map(d =>
      mean + ((i * 31 + d * 17 + 7) % 13 - 6) / 10.0)

  /** Two subpopulations with distinct means (shard 0 around +5, shard 1
    * around −5), each with one planted near-identical pair.
    */
  private def mixedCorpus: DataFrame = {
    val rows =
      (0L until 40L).map(i => (i, 0L, vec(i, 5.0))) ++
      (100L until 140L).map(i => (i, 1L, vec(i, -5.0))) ++
      Seq((200L, 0L, vec(3L, 5.0).map(_ + 0.001)),
          (201L, 1L, vec(103L, -5.0).map(_ + 0.001)))
    rows.toDF("id", "shard", "v")
  }

  test("sharded near-dup finds the planted same-shard pairs") {
    val pairs = CosineSignLsh
      .nearDupPairsSharded(mixedCorpus, "id", "v", "shard", dim = Dim,
        threshold = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 200L)), s"shard-0 planted pair missing: $pairs")
    assert(pairs.contains((103L, 201L)), s"shard-1 planted pair missing: $pairs")
  }

  test("candidates never cross shards, even for identical vectors") {
    // identical vector planted in BOTH shards: same signature bits, but the
    // band key carries the shard, so no cross-shard candidate may form
    val v = vec(7L, 0.0)
    val df = Seq((1L, 0L, v), (2L, 1L, v)).toDF("id", "shard", "v")
      .unionAll(mixedCorpus.filter(col("id") < 210))
    val cand = CosineSignLsh
      .shardedScoredCandidates(df.persist(), "id", "v", "shard", Dim, 0, 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    df.unpersist(false)
    assert(!cand.contains((1L, 2L)),
      "identical vectors in different shards must not be candidates")
  }

  test("per-shard offsets equal the per-shard mean's plane dots") {
    // dot commutes with the mean: avg_i dot(v_i, p) == dot(avg_i v_i, p).
    // The implementation relies on this identity; pin it numerically.
    val df = mixedCorpus.filter(col("shard") === 0L)
    val np = 8
    val ps = CosineSignLsh.planes(np, Dim)
    val vs = df.select("v").as[Seq[Double]].collect()
    val mu = (0 until Dim).map(d => vs.map(_(d)).sum / vs.length)
    val viaMean = ps.map(p => p.zip(mu).map { case (a, b) => a * b }.sum)
    val viaAvg = ps.map(p =>
      vs.map(v => p.zip(v).map { case (a, b) => a * b }.sum).sum / vs.length)
    viaMean.zip(viaAvg).foreach { case (m, a) =>
      assert(math.abs(m - a) <= math.abs(m).max(1.0) * 1e-9) }
  }

  test("mixed corpus: per-shard centering collapses the candidate volume vs global") {
    // With one global centering, every vector in shard 0 sits far on the
    // positive side of most planes (mean +5) and shard 1 far negative —
    // sign bits are near-constant WITHIN each shard, so each shard piles
    // into a handful of buckets and candidate volume explodes. Per-shard
    // centering rebalances the bits inside each shard.
    val df = mixedCorpus.persist()
    val bits = 4 // pin the width so both paths hash into the same key space
    val global = CosineSignLsh
      .scoredCandidates(df, "id", "v", Dim, nPlanes = 16, bandBits = bits,
        center = true).count()
    val sharded = CosineSignLsh
      .shardedScoredCandidates(df, "id", "v", "shard", Dim,
        nPlanes = 16, bandBits = bits).count()
    df.unpersist(false)
    info(s"candidates: global-centered=$global per-shard-centered=$sharded")
    assert(sharded * 2 <= global,
      s"per-shard centering should collapse candidates: sharded=$sharded global=$global")
  }
}
