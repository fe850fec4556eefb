package graft

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic bucket behavior of the MLlib BRP-LSH index backing check
  * #19 (VectorTier.lshModel, seed 42) — the one index whose hash function
  * is MLlib-internal and so can't be oracled in SQL (VERDICT r2 "what's
  * missing" #3). This spec pins the properties the recall check relies on:
  * the same seed reproduces the same buckets run-to-run, and bucket
  * sharing orders by distance (a near-identical pair shares hashes; a far
  * pair shares fewer).
  */
class BrpLshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(seed: Int): Seq[Double] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(dim)(rng.nextDouble() * 10 - 5)
  }

  private def fitHashes(df: DataFrame): Map[Long, Seq[Double]] = {
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(1.0).setNumHashTables(3).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
      .fit(df)
    model.transform(df)
      .select(col("id"), col("hashes"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.ml.linalg.Vector](1).map(_(0)).toSeq)
      .toMap
  }

  private lazy val corpus = ((1 to 20).map(i => (i.toLong, vec(i))) :+
    (1001L, vec(1).map(_ + 0.01))) // planted near-dup of id 1
    .toDF("id", "v")
    .withColumn("features", array_to_vector(col("v")))

  test("same seed -> bit-identical buckets across independent fits") {
    val h1 = fitHashes(corpus)
    val h2 = fitHashes(corpus)
    assert(h1 == h2, "seeded BRP-LSH must be reproducible fit-to-fit")
  }

  test("near-identical vectors share every hash table's bucket") {
    val h = fitHashes(corpus)
    val shared = h(1L).zip(h(1001L)).count { case (a, b) => a == b }
    assert(shared == 3, s"near-dup pair shares $shared/3 buckets")
    // distant vectors must not ALL collide across every table (bucket
    // length 1.0 on a ±5 cube keeps random collisions partial)
    val farShared = for (i <- 2L to 20L)
      yield h(1L).zip(h(i)).count { case (a, b) => a == b }
    assert(farShared.exists(_ < 3), "every far pair fully collided")
  }
}
