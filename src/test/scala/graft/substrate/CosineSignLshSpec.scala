package graft.substrate

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sign-LSH near-dup: planted near-identical vectors are found, dissimilar
  * background is not, and the plan never falls back to an all-pairs
  * product.
  */
class CosineSignLshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Seeded-random background vectors — mutually far in cosine with
    * overwhelming probability (and fully deterministic under the seed).
    */
  private def vec(seed: Int): Seq[Double] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(dim)(rng.nextDouble() * 2000 - 1000)
  }

  private val base = (1 to 30).map(i => (i.toLong, vec(i)))
  // two planted near-dups: tiny constant shift of existing vectors
  private val dups = Seq(
    (1001L, vec(1).map(_ + 0.5)),
    (1015L, vec(15).map(_ + 0.5)))
  private lazy val vecs = (base ++ dups).toDF("id", "v")

  test("finds exactly the planted near-dup pairs") {
    val out = CosineSignLsh.nearDupPairs(vecs, "id", "v", dim,
        threshold = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1001L), (15L, 1015L)))
  }

  test("weight components are centered and reproducible") {
    assert(CosineSignLsh.weight(0, 0, 64) == (40503L % 2000001L - 1000000L).toDouble)
    val all = for (p <- 0 until 16; d <- 0 until 64)
      yield CosineSignLsh.weight(p, d, 64)
    assert(all.forall(w => w >= -1000000 && w <= 1000000))
    assert(math.abs(all.sum / all.size) < 100000, "weights badly off-center")
  }

  test("autoBandBits follows the clamped ceil-log2 policy, and the SQL ladder mirrors it") {
    assert(CosineSignLsh.autoBandBits(1) == 6)
    assert(CosineSignLsh.autoBandBits(1024) == 6)   // 2^10 → 6 (clamp floor)
    assert(CosineSignLsh.autoBandBits(1025) == 7)
    assert(CosineSignLsh.autoBandBits(5200) == 9)   // ceil_log2 = 13
    assert(CosineSignLsh.autoBandBits(1L << 20) == 16)
    assert(CosineSignLsh.autoBandBits(1L << 28) == 24)
    assert(CosineSignLsh.autoBandBits(Long.MaxValue) == 24) // clamp ceiling
    val ns = Seq(1L, 2L, 100L, 1024L, 1025L, 4096L, 5200L,
      1L << 20, (1L << 24) + 7, 1L << 28, (1L << 28) + 1)
    val mirrored = ns.toDF("n")
      .selectExpr("n", s"${CosineSignLsh.autoBandBitsCaseSql} AS bits")
      .as[(Long, Int)].collect()
    mirrored.foreach { case (n, bits) =>
      assert(bits == CosineSignLsh.autoBandBits(n), s"ladder diverges at n=$n")
    }
  }

  test("autoBandBits warns past the 2^28 clamp boundary, silent at it") {
    // past AutoBandBitsMaxN occupancy grows linearly again (the 24-bit
    // clamp); the policy still returns 24 but must say so out loud
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try {
      assert(CosineSignLsh.autoBandBits(CosineSignLsh.AutoBandBitsMaxN) == 24)
      assert(buf.toString.isEmpty, "warned at the boundary itself")
      assert(CosineSignLsh.autoBandBits(CosineSignLsh.AutoBandBitsMaxN + 1) == 24)
      assert(buf.toString.contains("shard the corpus"),
        "no sharding warning past the clamp boundary")
    } finally System.setErr(old)
  }

  test("explicit nPlanes alone resolves to the DefaultBands split, no crash") {
    // pre-auto callers pinned nPlanes=32 and relied on 8-bit bands; with
    // bandBits unset the width must derive from nPlanes (32/4 bands = 8),
    // never from the corpus count (which may not tile nPlanes)
    val out = CosineSignLsh.nearDupPairs(vecs, "id", "v", dim,
        nPlanes = 32, threshold = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1001L), (15L, 1015L)))
  }

  test("auto width preserves planted recall across the 6->7-bit boundary") {
    // corpora straddling n = 1024 (where autoBandBits steps 6 -> 7):
    // widening bands must not lose the planted near-identical pairs
    for (n <- Seq(900, 1100)) {
      val rng = new scala.util.Random(n)
      val base = (1 to n).map(i =>
        (i.toLong, Seq.fill(dim)(rng.nextDouble() * 2000 - 1000)))
      val planted = Seq(
        (100001L, base(0)._2.map(_ + 0.5)),
        (100002L, base(n / 2)._2.map(_ + 0.5)))
      val corpus = (base ++ planted).toDF("id", "v")
      val found = CosineSignLsh.nearDupPairs(corpus, "id", "v", dim,
          threshold = 0.999)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(found == Set((1L, 100001L), ((n / 2 + 1).toLong, 100002L)),
        s"n=$n (bits=${CosineSignLsh.autoBandBits(n + 2)}): $found")
    }
  }

  test("topKPairs ranks the planted near-dups at the head") {
    val top = CosineSignLsh.topKPairs(vecs, "id", "v", dim, k = 5)
      .select("rank", "a", "b").as[(Long, Long, Long)].collect()
    // the two planted pairs (cos ≈ 1) must occupy ranks 1 and 2, ahead of
    // any background pair the buckets happened to catch
    val headPairs = top.filter(_._1 <= 2).map(t => (t._2, t._3)).toSet
    assert(headPairs == Set((1L, 1001L), (15L, 1015L)),
      s"planted pairs not ranked first: ${top.mkString(", ")}")
    assert(top.map(_._1).toSeq == (1L to top.length).toSeq)
  }

  test("plans bucket joins, never an all-pairs product") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = CosineSignLsh
        .bandKeys(vecs, "id", "v", nPlanes = 16, bandBits = 4, dim = dim)
        .join(CosineSignLsh.bandKeys(vecs, "id", "v", 16, 4, dim)
          .withColumnRenamed("id", "id2"), Seq("band", "bkey"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs product in sign-LSH plan:\n$plan")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
