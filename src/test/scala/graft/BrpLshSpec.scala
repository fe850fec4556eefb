package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.substrate.BrpLsh

/** Deterministic multi-probe BRP-LSH (substrate.BrpLsh) — the in-house
  * euclidean index behind check #19, replacing the MLlib fitted model
  * (VERDICT r3 #6). Pins the properties the recall check relies on:
  * buckets are pure arithmetic (reproducible run-to-run with no fit), a
  * near-identical pair shares every table's bucket, the probe window
  * recovers neighbors one bucket over, and the candidate step plans as an
  * equi-join (no all-pairs product).
  */
class BrpLshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(seed: Int): Seq[Double] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(dim)(rng.nextDouble() * 10 - 5)
  }

  private lazy val corpus = ((1 to 20).map(i => (i.toLong, vec(i))) :+
    (1001L, vec(1).map(_ + 0.0001))) // planted near-dup of id 1
    .toDF("vec_id", "v")

  // bucketLength sized to the ±5 cube with ±1e6-scale weights: dot spread
  // is ~|w|·|v| ≈ 1e6·10, so 2e6 buckets resolve ~10 levels per table
  private val L = 2e6

  test("buckets are deterministic arithmetic: two independent plans agree") {
    val k1 = BrpLsh.bucketKeys(corpus, "vec_id", "v", dim, 4, L).collect()
    val k2 = BrpLsh.bucketKeys(corpus, "vec_id", "v", dim, 4, L).collect()
    assert(k1.toSet == k2.toSet)
    assert(k1.length == 21 * 4) // one row per (vector, table)
  }

  test("near-identical vectors share every table's bucket") {
    val bk = BrpLsh.bucketKeys(corpus, "vec_id", "v", dim, 4, L)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(bk(1L) == bk(1001L), "near-dup pair must fully collide")
    // distant vectors must not ALL collide across every table
    val farShared = for (i <- 2L to 20L)
      yield bk(1L).zip(bk(i)).count { case (a, b) => a == b }
    assert(farShared.exists(_ < 4), "every far pair fully collided")
  }

  test("topK surfaces the planted neighbor at rank 1 and never all-pairs") {
    val q = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = BrpLsh.topK(corpus, q, dim, k = 3, nTables = 4,
      bucketLength = L, probe = 1)
    val rows = top.as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(rows.head == ((1L, 1L, 1001L)),
      s"planted neighbor not rank 1: ${rows.mkString(", ")}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = BrpLsh.topK(corpus, q, dim, k = 3, nTables = 4,
          bucketLength = L, probe = 1)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs product in BRP plan:\n$plan")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("randomized: a planted near-duplicate is recalled at rank 1 (8 corpora)") {
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(seed * 77)
      val n = 30 + rng.nextInt(40)
      val base = (1 to n).map(i =>
        (i.toLong, Seq.fill(dim)(rng.nextDouble() * 10 - 5)))
      val dupOf = 1L + rng.nextInt(n)
      val corpus = (base :+
        (9999L, base(dupOf.toInt - 1)._2.map(_ + 0.0001)))
        .toDF("vec_id", "v")
      val q = corpus.filter(col("vec_id") === dupOf)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val top = BrpLsh.topK(corpus, q, dim, k = 1, nTables = 4,
        bucketLength = L, probe = 1).as[(Long, Long, Long)].collect()
      assert(top.toSeq == Seq((dupOf, 1L, 9999L)),
        s"seed $seed: planted dup of $dupOf not recalled: ${top.mkString(",")}")
    }
  }

  test("auto widths are spread*occupancy/n per table; default topK recalls the planted dup") {
    val dots = BrpLsh.projections(corpus, "vec_id", "v", dim, 4)
    val lengths = BrpLsh.autoBucketLengths(dots, 4, occupancy = 8)
    val ext = dots.groupBy("tbl")
      .agg(max("dot").as("mx"), min("dot").as("mn"), count(lit(1)).as("n"))
      .as[(Int, Double, Double, Long)].collect()
    assert(ext.length == 4)
    ext.foreach { case (t, mx, mn, n) =>
      assert(n == 21)
      // the exact derivation the oracle CTE mirrors: (mx-mn)*occ/n
      assert(lengths(t) == (mx - mn) * 8 / n, s"table $t width mismatch")
    }
    // default (auto) topK: the near-identical pair still fully collides —
    // identical-to-4-decimal vectors share every bucket at any data width
    val q = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = BrpLsh.topK(corpus, q, dim, k = 1, nTables = 4)
      .as[(Long, Long, Long)].collect()
    assert(top.toSeq == Seq((1L, 1L, 1001L)), s"auto path lost the dup: ${top.mkString(",")}")
  }

  test("probe window recovers a neighbor one bucket over") {
    // two vectors straddling a bucket boundary: dots differ by < L but can
    // floor to adjacent buckets; probe=1 must still pair them as candidates
    val a = Seq.fill(dim)(0.0)
    val b = Seq.fill(dim)(0.001) // tiny offset — adjacent or same bucket
    val df = Seq((1L, a), (2L, b)).toDF("vec_id", "v")
    val q = df.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val top = BrpLsh.topK(df, q, dim, k = 1, nTables = 4,
      bucketLength = L, probe = 1).as[(Long, Long, Long)].collect()
    assert(top.toSeq == Seq((1L, 1L, 2L)))
  }

  test("DerivationCache: independently-built identical plans share one derivation") {
    // The bench-wall fix (VERDICT r6 #5) hinges on the memo hitting when a
    // DIFFERENT check rebuilds the same corpus plan from scratch — i.e.
    // canonicalized semantic hashes must match across separate
    // spark.read/select chains, not just for the same DataFrame object.
    graft.substrate.DerivationCache.clear()
    def dots = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          graft.substrate.VectorOps.toDoubleArr(col("embedding")).as("v"))
      BrpLsh.projections(e, "vec_id", "v", 64, 4)
    }
    val l1 = BrpLsh.autoBucketLengths(dots, 4, 64)
    val before = graft.substrate.DerivationCache.size
    val l2 = BrpLsh.autoBucketLengths(dots, 4, 64) // fresh plan, same shape
    assert(l1 == l2)
    assert(graft.substrate.DerivationCache.size == before,
      "identical rebuilt plan must HIT the cache, not add an entry")
    // different parameters must MISS (tag carries them)
    BrpLsh.autoBucketLengths(dots, 4, 32)
    assert(graft.substrate.DerivationCache.size == before + 1)
    graft.substrate.DerivationCache.clear()
  }

  test("DerivationCache: memoized derivations may NEST (stored index consumes stored fixture)") {
    // plantedResidIndex memoizes a build whose body consumes the memoized
    // plantedCorpus — computeIfAbsent threw 'Recursive update' when the
    // two keys collided on a map bin (seen at sf0.01; bin landing is hash
    // luck, so the contract must be re-entrancy, not luck)
    import graft.substrate.DerivationCache
    DerivationCache.clear()
    val df = spark.range(8).toDF("id")
    val outer = DerivationCache.memo(df, "nest/outer") {
      1 + DerivationCache.memo(df, "nest/inner") { 41 }
    }
    assert(outer == 42 && DerivationCache.memo(df, "nest/inner") { -1 } == 41)
    DerivationCache.clear()
  }

  test("DerivationCache: a SAME-KEY self-cycle fails loudly, not with StackOverflowError") {
    // lazy-val init holds a reentrant monitor, so a compute body asking
    // for its own key would re-run the initializer and recurse until
    // StackOverflowError deep in Spark planning; the Cell names the
    // cycle instead (code-review r11). A failed slot keeps its ORIGINAL
    // compute closure (the memo contract: one key = one closure), so a
    // retry re-runs it and fails just as loudly — never caches a broken
    // value — and clear() restores the key
    import graft.substrate.DerivationCache
    DerivationCache.clear()
    val df = spark.range(2).toDF("id")
    def cyclic(): Int = DerivationCache.memo(df, "cycle") {
      DerivationCache.memo(df, "cycle") { 0 }
    }
    val ex = intercept[IllegalStateException] { cyclic() }
    assert(ex.getMessage.contains("Recursive derivation"))
    intercept[IllegalStateException] { cyclic() }
    DerivationCache.clear()
    assert(DerivationCache.memo(df, "cycle") { 7 } == 7)
    DerivationCache.clear()
  }

  test("DerivationCache: concurrent same-key callers share ONE computation") {
    // the concurrent bench suite launches several checks sharing one
    // stored index — a lock-free memo let all of them build it in
    // parallel (58.8 s suite wall vs 32.6, r11); same-key callers must
    // block on the single in-flight build
    import graft.substrate.DerivationCache
    DerivationCache.clear()
    val df = spark.range(4).toDF("id")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val vals = (1 to 8).map(_ => Future {
      DerivationCache.memo(df, "conc") {
        Thread.sleep(100); builds.incrementAndGet()
      }
    }).map(Await.result(_, Duration.Inf))
    pool.shutdown()
    assert(builds.get == 1, s"expected one build, got ${builds.get}")
    assert(vals.toSet == Set(1))
    DerivationCache.clear()
  }
}
