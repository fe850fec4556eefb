package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.substrate.{BrpLsh, CosineSignLsh, IvfIndex, MinHashLsh, PqIndex, VectorOps}

/** Empirical scale rehearsal for the dedup/ANN tier (VERDICT r2 #6): runs
  * the sub-quadratic candidate generators on 1× and 10× corpora — and a
  * THIRD decade (100×) for the claims that extrapolate to 100 TB (the
  * sign-LSH/BRP auto-width falling candidate rate and the components
  * log-diameter rounds, VERDICT r4 #3: two points are a line, three are
  * a trend) — and records candidate-pair counts, candidate RATE
  * (pairs / C(n,2)), wall time, and shuffle bytes — validating that the
  * banded/bucketed designs hold up when the data grows, and quantifying
  * the width knobs that keep them sub-quadratic at 100 TB.
  *
  * The 10× corpora are deterministic replicas constructed to be MUTUALLY
  * DISSIMILAR (no cross-replica near-dups), so within-replica similarity
  * structure is preserved and the measured growth is the honest background
  * rate, not planted duplication:
  *  - shingles: replica k suffixes every shingle with "#k" (zero shared
  *    shingles across replicas);
  *  - embeddings: replica k multiplies component d by a deterministic ±1
  *    sign s(k,d) (sign-scrambled vectors are far in cosine).
  *
  * Usage: runMain graft.tools.ScaleRehearsal [sfDir] [outMd]
  */
object ScaleRehearsal {

  /** Aggregated shuffle bytes across completed stages (listener events are
    * async — callers settle with a short sleep before reading deltas).
    */
  private final class ShuffleMeter extends SparkListener {
    val read = new AtomicLong(0L)
    val write = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  final case class Sample(op: String, scale: String, n: Long, pairs: Long,
      wallSec: Double, shuffleMb: Double, showRate: Boolean = true) {
    def rate: Double =
      if (n < 2) 0.0 else pairs.toDouble / (n.toDouble * (n - 1) / 2)
    def row: String = {
      val r = if (showRate) f"${rate * 100}%.4f%%" else "n/a"
      f"| $op | $scale | $n%,d | $pairs%,d | $r | $wallSec%.1f | $shuffleMb%.0f |"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outMd = if (args.length > 1) args(1) else "SCALE.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def measured(op: String, scale: String, n: Long)(body: => Long): Sample = {
      Thread.sleep(1500) // settle listener before snapshotting
      val r0 = meter.read.get(); val w0 = meter.write.get()
      val t0 = System.nanoTime()
      val pairs = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      val mb = (meter.read.get() - r0 + meter.write.get() - w0) / 1e6
      val s = Sample(op, scale, n, pairs, wall, mb)
      System.err.println(s"[scale] ${s.row}")
      s
    }

    // ---- corpora -----------------------------------------------------
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val shingles1 = docs
      .select(col("doc_id"),
        explode(graft.substrate.TextOps.wordTrigrams(col("text"))).as("shingle"))
      .persist()
    val shingles10 = (0 until 10).map { k =>
      if (k == 0) shingles1
      else shingles1.select((col("doc_id") + k * 10000000L).as("doc_id"),
        concat(col("shingle"), lit(s"#$k")).as("shingle"))
    }.reduce(_ unionAll _).persist()

    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .persist()
    // sign-scramble: s(k,d) = ±1 from the CosineSignLsh.weight integer-hash
    // family (sign of the centered hash value), so the sign depends on BOTH
    // k and d — a parity-of-odd-multiple scheme would collapse to d alone
    // and make replicas exact copies (ADVICE r3). k=0 keeps the original
    // corpus; replicas 1..copies-1 get mutually distinct scrambles.
    def embScaled(copies: Int): DataFrame = (0 until copies).map { k =>
      if (k == 0) emb1
      else emb1.select((col("vec_id") + k * 10000000L).as("vec_id"),
        expr(s"transform(v, (x, d) -> CASE WHEN (($k * 64 + d) * 2654435761 + 40503) % 2000001 < 1000000 THEN x ELSE -x END)")
          .as("v"))
    }.reduce(_ unionAll _)
    val emb10 = embScaled(10).persist()
    val emb100 = embScaled(100).persist()

    val nDocs1 = shingles1.select("doc_id").distinct().count()
    val nDocs10 = shingles10.select("doc_id").distinct().count()
    val nEmb1 = emb1.count(); val nEmb10 = emb10.count()
    val nEmb100 = emb100.count()

    // ---- MinHash LSH (xxhash64 production path) ----------------------
    // candidate prefix mirrors MinHashLsh.nearDupPairs' banding exactly
    def minhashCandidates(sh: DataFrame, numPerms: Int, bandRows: Int): Long = {
      val sigCols = (0 until numPerms)
        .map(p => min(MinHashLsh.defaultHash(col("shingle"), p)).as(s"m$p"))
      val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      val nBands = numPerms / bandRows
      val banded = (0 until nBands).map { b =>
        val cols = (b * bandRows until (b + 1) * bandRows).map(i => col(s"m$i"))
        sigs.select(col("doc_id"), lit(b).as("band"),
          MinHashLsh.defaultBandKey(cols).as("bkey"))
      }.reduce(_ unionAll _)
      banded.select(col("band"), col("bkey"), col("doc_id").as("a"))
        .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b")),
          Seq("band", "bkey"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
    }

    val samples = Seq.newBuilder[Sample]
    samples += measured("minhash_lsh cand (12 perms, r=2)", "1x", nDocs1) {
      minhashCandidates(shingles1, 12, 2)
    }
    samples += measured("minhash_lsh cand (12 perms, r=2)", "10x", nDocs10) {
      minhashCandidates(shingles10, 12, 2)
    }
    samples += measured("minhash_lsh verified pairs", "10x", nDocs10) {
      MinHashLsh.nearDupPairs(shingles10, threshold = 0.5).count()
    }

    // ---- incremental (delta vs stored index) -------------------------
    // delta = a 10% slice of every replica (base id % 10 == 3), index =
    // the rest: the nightly-ingest shape. Work tracks |delta|·rate, not
    // |corpus|², and the found pairs are the cross-set share of the full
    // dedup's verified pairs.
    locally {
      val baseId = col("doc_id") % 10000000L
      val delta = shingles10.filter(baseId % 10 === 3)
      val corpusIdx = shingles10.filter(baseId % 10 =!= 3)
      samples += measured("incremental delta-vs-index verified pairs", "10x", nDocs10) {
        MinHashLsh.nearDupPairsAgainst(delta, corpusIdx, threshold = 0.5).count()
      }
    }

    // ---- sign-LSH (embedding near-dup) -------------------------------
    def signCandidates(e: DataFrame, bandBits: Int): Long =
      CosineSignLsh.scoredCandidates(e, "vec_id", "v", dim = 64,
        nPlanes = 32, bandBits = bandBits, center = true).count()

    samples += measured("sign_lsh cand (32 planes, 8-bit bands)", "1x", nEmb1) {
      signCandidates(emb1, 8)
    }
    samples += measured("sign_lsh cand (32 planes, 8-bit bands)", "10x", nEmb10) {
      signCandidates(emb10, 8)
    }
    samples += measured("sign_lsh cand (32 planes, 16-bit bands)", "10x", nEmb10) {
      signCandidates(emb10, 16)
    }
    // AUTO band width (the default since r4 — VERDICT r3 #1): bandBits
    // derives from the corpus count inside scoredCandidates, no knob. The
    // sub-quadratic claim: the auto rate must FALL from 1× to 10×.
    def signAuto(e: DataFrame): Long =
      CosineSignLsh.scoredCandidates(e, "vec_id", "v", dim = 64,
        nPlanes = 0, bandBits = 0, center = true).count()
    samples += measured(
      s"sign_lsh cand (auto: ${CosineSignLsh.autoBandBits(nEmb1)}-bit)", "1x",
      nEmb1) { signAuto(emb1) }
    samples += measured(
      s"sign_lsh cand (auto: ${CosineSignLsh.autoBandBits(nEmb10)}-bit)", "10x",
      nEmb10) { signAuto(emb10) }
    // third decade (VERDICT r4 #3): the auto-width rate must KEEP falling
    samples += measured(
      s"sign_lsh cand (auto: ${CosineSignLsh.autoBandBits(nEmb100)}-bit)", "100x",
      nEmb100) { signAuto(emb100) }
    // PER-SHARD centering (r5): the replica corpus is exactly the mixed-
    // corpus shape that dampens the global rows (k subpopulations, each
    // with its own scrambled mean) — shard by replica and center each on
    // its own mean (nearDupPairsSharded's core). The claim: the sharded
    // rate sits well below the global-centered rate at the same scale,
    // because per-shard centering rebalances the sign bits the global
    // mean cannot. (Band width auto-derives from the LARGEST shard, so
    // the sharded rows use fewer bits yet still collide less.)
    def signShardedAuto(e: DataFrame): Long = {
      val sharded = e.withColumn("shard",
        (col("vec_id") / 10000000L).cast("long"))
      CosineSignLsh.shardedScoredCandidates(sharded, "vec_id", "v",
        "shard", dim = 64, nPlanes = 0, bandBits = 0).count()
    }
    samples += measured("sign_lsh SHARDED cand (auto, shard=replica)", "10x",
      nEmb10) { signShardedAuto(emb10) }
    samples += measured("sign_lsh SHARDED cand (auto, shard=replica)", "100x",
      nEmb100) { signShardedAuto(emb100) }

    // ---- IVF ANN -----------------------------------------------------
    // centroid count scales with n (mod stays fixed), so mean cell size is
    // constant — the knob that keeps probe work per query flat
    def ivf(e: DataFrame): Long = {
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      IvfIndex.topK(e, q, centroidMod = 23, k = 10, nProbe = 4).count()
    }
    samples += measured("ivf_topk result rows (k=10)", "1x", nEmb1) { ivf(emb1) }
    samples += measured("ivf_topk result rows (k=10)", "10x", nEmb10) { ivf(emb10) }

    // ---- BRP multi-probe (serving ANN index) ---------------------------
    // value-space buckets: with FIXED bucketLength the occupied-bucket
    // count tracks the data spread, not n, so candidate RATE stays
    // ~constant — the same quadratic limit fixed sign-LSH bands had, with
    // bucket WIDTH as the knob (the L/4 row shows the rate falling at the
    // same n). Check #19 deliberately runs a generous width: its corpus is
    // isotropic background whose exact top-10 sits barely nearer than
    // random, so recall there trades directly against candidate volume.
    def brpCand(e: DataFrame, bucketLength: Double): Long = {
      val bk = BrpLsh.bucketKeys(e, "vec_id", "v", dim = 64,
        nTables = 6, bucketLength = bucketLength)
      bk.select(col("tbl"), col("bucket"), col("vec_id").as("a"))
        .join(bk.select(col("tbl"), col("bucket"), col("vec_id").as("b")),
          Seq("tbl", "bucket"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
    }
    samples += measured("brp cand (6 tables, L=2e5)", "1x", nEmb1) {
      brpCand(emb1, 2e5)
    }
    samples += measured("brp cand (6 tables, L=2e5)", "10x", nEmb10) {
      brpCand(emb10, 2e5)
    }
    samples += measured("brp cand (6 tables, L=5e4)", "10x", nEmb10) {
      brpCand(emb10, 5e4)
    }
    // AUTO per-table widths (the default since r5 — VERDICT r4 #1):
    // L_t = spread_t × occupancy / n, so bucket count grows with n and
    // the rate must FALL 1× → 10× → 100× where the fixed L held it flat.
    def brpCandAuto(e: DataFrame): Long = {
      val dots = BrpLsh.projections(e, "vec_id", "v", dim = 64, nTables = 6)
      val bk = BrpLsh.bucketKeysFromDots(dots, "vec_id",
        BrpLsh.autoBucketLengths(dots, nTables = 6))
      bk.select(col("tbl"), col("bucket"), col("vec_id").as("a"))
        .join(bk.select(col("tbl"), col("bucket"), col("vec_id").as("b")),
          Seq("tbl", "bucket"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
    }
    val occ = BrpLsh.DefaultOccupancy
    samples += measured(s"brp cand (auto occ=$occ)", "1x", nEmb1) {
      brpCandAuto(emb1)
    }
    samples += measured(s"brp cand (auto occ=$occ)", "10x", nEmb10) {
      brpCandAuto(emb10)
    }
    samples += measured(s"brp cand (auto occ=$occ)", "100x", nEmb100) {
      brpCandAuto(emb100)
    }

    // ---- semantic dedup (cluster-scoped within-cell pairs) -------------
    // Cell occupancy is held constant (|C| = n/23 centroids), so the
    // within-cell PAIR term is linear and its rate must fall ~10× per
    // decade. The quadratic hides in FLAT assignment — n·|C| distance
    // evals — which is what the hierarchical route (coarse = |C|/8,
    // 4 probes: n·(|C|/8 + ~4·8) evals) exists to cut; the wall columns
    // at 100× carry that claim. Pair counts between the two rows differ
    // only by probe-miss reassignment (near-ties on this isotropic
    // corpus — SemanticDedupSpec pins that near-dup pairs still co-route).
    def semanticPairs(assigned: DataFrame): Long = {
      val a = assigned.select(col("cell"), col("vec_id").as("a"))
      val b = assigned.select(col("cell"), col("vec_id").as("b"))
      a.join(b, Seq("cell")).filter(col("a") < col("b")).count()
    }
    samples += measured("semantic cell pairs (flat assign, occ=23)", "1x", nEmb1) {
      semanticPairs(IvfIndex.assign(emb1, centroidMod = 23))
    }
    samples += measured("semantic cell pairs (flat assign, occ=23)", "10x", nEmb10) {
      semanticPairs(IvfIndex.assign(emb10, centroidMod = 23))
    }
    samples += measured("semantic cell pairs (flat assign, occ=23)", "100x", nEmb100) {
      semanticPairs(IvfIndex.assign(emb100, centroidMod = 23))
    }
    samples += measured("semantic cell pairs (auto assign, w=4)", "10x", nEmb10) {
      semanticPairs(IvfIndex.assignAuto(emb10, 23))
    }
    samples += measured("semantic cell pairs (auto assign, w=4)", "100x", nEmb100) {
      semanticPairs(IvfIndex.assignAuto(emb100, 23))
    }

    // ---- IVF assignment WORK: flat vs auto vs routed (VERDICT r6 #4) ---
    // The quantity under test is exact-DISTANCE-EVALUATION rows per
    // vector — counted from the actual candidate-join cardinalities each
    // path produces (count() of the pre-argmin join; the distance column
    // is never evaluated by the count, so the measurement is cheap and
    // exact). Claims: flat grows ~n per decade (|C| = n/23), auto grows
    // ~√n (|coarse| + routed-fine candidates), routed stays FLAT
    // (occupancy-bounded buckets; + the measured miss-set × |C| fallback).
    // Routed additionally pays nTables hash dots per vector — map-side
    // multiply-adds, not distance evals; noted in the prose.
    def ivfEvalsFlat(e: DataFrame, n: Long, scale: String): Unit = {
      val cents = e.filter(col("vec_id") % 23 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val s = measured("ivf assign evals FLAT", scale, n) {
        e.crossJoin(broadcast(cents)).count()
      }
      samples += s.copy(op = s.op + f" (${s.pairs.toDouble / n}%.0f/vec)",
        showRate = false)
    }
    def ivfEvalsAuto(e: DataFrame, n: Long, scale: String): Unit = {
      val fine = e.filter(col("vec_id") % 23 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val nC = fine.count()
      val f = IvfIndex.autoCoarseFactor(nC)
      val coarse = e.filter(col("vec_id") % (23L * f) === 0)
        .select(col("vec_id").as("co_id"), col("v").as("cov"))
      val nCo = coarse.count()
      val s = measured(s"ivf assign evals AUTO (f=$f)", scale, n) {
        // assignAuto's three distance-eval joins, counted at assignHier's
        // exact shapes: fine→coarse routing, per-vector coarse probe, and
        // the routed-fine candidate rows after the top-4 probe explode
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id")
          .orderBy(col("d2").asc, col("co_id").asc)
        val routedFine = fine.crossJoin(broadcast(coarse))
          .select(col("cent_id"),
            VectorOps.sqDist(col("cv"), col("cov")).as("d2"), col("co_id"))
          .groupBy("cent_id")
          .agg(min_by(col("co_id"), struct(col("d2"), col("co_id"))).as("co_id"))
        val probes = e.crossJoin(broadcast(coarse))
          .select(col("vec_id"),
            VectorOps.sqDist(col("v"), col("cov")).as("d2"), col("co_id"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
          .select(col("vec_id"), col("co_id"))
        val fineCand = probes.join(broadcast(routedFine), Seq("co_id")).count()
        nC * nCo + n * nCo + fineCand
      }
      samples += s.copy(op = s.op + f" (${s.pairs.toDouble / n}%.0f/vec)",
        showRate = false)
    }
    def ivfEvalsRouted(e: DataFrame, n: Long, scale: String): Unit = {
      val cents = e.filter(col("vec_id") % 23 === 0)
        .select(col("vec_id").as("cent_id"))
      val nC = cents.count()
      val s = measured("ivf assign evals ROUTED", scale, n) {
        val dots = BrpLsh.projections(e, "vec_id", "v", 64,
          IvfIndex.RoutedTables)
        val lengths = BrpLsh.autoBucketLengths(dots, IvfIndex.RoutedTables,
          IvfIndex.RoutedOccupancy)
        val vb = BrpLsh.bucketKeysFromDots(dots, "vec_id", lengths)
        val cb = vb.join(cents, vb("vec_id") === col("cent_id"))
          .select(col("cent_id"), col("tbl"),
            explode(sequence(col("bucket") - IvfIndex.RoutedProbe,
              col("bucket") + IvfIndex.RoutedProbe)).as("bucket"))
        val cand = vb.join(cb, Seq("tbl", "bucket"))
          .select("vec_id", "cent_id").distinct().persist()
        val nCand = cand.count()
        val nMissed = e.join(cand.select("vec_id").distinct(),
          Seq("vec_id"), "left_anti").count()
        cand.unpersist()
        nCand + nMissed * nC
      }
      samples += s.copy(op = s.op + f" (${s.pairs.toDouble / n}%.0f/vec)",
        showRate = false)
    }
    Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
        (emb100, nEmb100, "100x")).foreach { case (e, n, sc) =>
      ivfEvalsFlat(e, n, sc)
      ivfEvalsAuto(e, n, sc)
      ivfEvalsRouted(e, n, sc)
    }

    // ---- PQ encode: shuffle-free compression across three decades ----
    // PqIndex.encode's at-scale claim: the codebook rides in as LITERAL
    // centroid arrays, so encoding is a pure map-side projection — the
    // wall must grow ~linearly with n while shuffle stays ~ZERO at every
    // decade (what lets a 100 TB corpus re-encode without one exchange).
    // Codebook trained ONCE on the 1× sample — the production shape:
    // train on a slice, encode everything.
    locally {
      val pqCb = PqIndex.codebookArrays(
        PqIndex.codebooks(emb1, "vec_id", "v", dim = 64))
      Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
          (emb100, nEmb100, "100x")).foreach { case (e, n, sc) =>
        val s = measured("pq encode codes (map-side only)", sc, n) {
          // FORCE the codes column: .count() lets Spark prune the encode
          // projection entirely (the wall would measure a columnless scan
          // — the r10 profiling trap); summing one code element evaluates
          // the native PqEncode per row
          PqIndex.encode(e, "vec_id", "v", pqCb, dim = 64)
            .agg(count(lit(1)), sum(element_at(col("codes"), 1)))
            .collect().head.getLong(0)
        }
        samples += s.copy(showRate = false)
      }
    }

    // ---- PQ PROD (k=256) encode: same zero-shuffle claim at the SLA
    // config — 16× more centroids per subspace moves the per-row encode
    // cost (the m·k distance folds now ride one nested-literal transform
    // per subspace, not m·k expression trees) but must NOT change the
    // plan shape: still a pure projection, shuffle ~ZERO at every decade.
    // This is the codebook `retrieval_recall_pq_prod` measures 0.93
    // recall@10 with — the knob sweep's bytes-vs-recall table lives in
    // the narrative below.
    locally {
      val pqCb256 = PqIndex.codebookArrays(
        PqIndex.codebooks(emb1, "vec_id", "v", dim = 64,
          k = PqIndex.ProdCodebookK, trainMod = PqIndex.ProdTrainMod,
          iters = PqIndex.ProdLloydIters),
        k = PqIndex.ProdCodebookK)
      Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
          (emb100, nEmb100, "100x")).foreach { case (e, n, sc) =>
        val s = measured("pq encode codes PROD k=256 (map-side only)", sc, n) {
          PqIndex.encode(e, "vec_id", "v", pqCb256, dim = 64)
            .agg(count(lit(1)), sum(element_at(col("codes"), 1)))
            .collect().head.getLong(0)
        }
        samples += s.copy(showRate = false)
      }
    }

    // ---- IVF-PQ: probed-candidate scan per query vs corpus decade -----
    // IvfPq.topK's at-scale claim: the candidate scan is an equi-join on
    // `cell` between the code table and the broadcast probe list, so
    // candidates PER QUERY ≈ nProbe × mean cell size — constant at fixed
    // centroidMod (cells grow in COUNT with n, not size) — where the
    // full-ADC scan (PqIndex.topK, the witness) pays n per query by
    // construction. The /query column must stay ~FLAT across all three
    // decades.
    locally {
      Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
          (emb100, nEmb100, "100x")).foreach { case (e, n, sc) =>
        val q = e.filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val nQ = math.max(1L, q.count())
        val s = measured("ivfpq probed candidates", sc, n) {
          val indexed = IvfIndex.assignAuto(e, 23).select("vec_id", "cell")
          val cents = e.filter(col("vec_id") % 23 === 0)
            .select(col("vec_id").as("cent_id"), col("v").as("cv"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("qd2").asc, col("cent_id"))
          val probes = q.crossJoin(broadcast(cents))
            .select(col("qid"), col("cent_id"),
              VectorOps.sqDist(col("qv"), col("cv")).as("qd2"))
            .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
            .select(col("qid"), col("cent_id").as("cell"))
          probes.join(indexed, Seq("cell")).count()
        }
        samples += s.copy(op = s.op +
          f" (|Q|=$nQ, ${s.pairs.toDouble / nQ}%.0f/query vs n=$n full-scan)",
          showRate = false)
      }
    }

    // ---- selective refresh: monitor + gated re-encode vs full ---------
    // index_refresh_selective's 100 TB claim (VERDICT r10 next #8): when
    // a fifth of the cells drift, the monitor's state is O(|C|·dim)
    // means and the gated rewrite touches ONLY the flagged cells' rows —
    // `selective re-encode rows` must track the drifted fraction (~n/5)
    // across the decades while `full re-encode rows` pays n; the row
    // (and wall) ratio is the nightly-maintenance bill the mechanism
    // divides. The monitor row counts FLAGGED CELLS (its output is
    // |C|-scale, never rows).
    locally {
      val selCb = PqIndex.codebookArrays(
        PqIndex.codebooks(emb1, "vec_id", "v", dim = 64))
      Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
          (emb100, nEmb100, "100x")).foreach { case (e, n, sc) =>
        val assigned = IvfIndex.assignAuto(e, 23).select("vec_id", "cell")
          .localCheckpoint(true)
        val cents0 = e.filter(col("vec_id") % 23 === 0)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        val p1 = e.join(assigned, Seq("vec_id"))
          .select(col("vec_id"), col("cell"),
            when(col("cell") % 5 === 0,
              transform(col("v"), x => x + lit(0.8)))
              .otherwise(transform(col("v"), x => x + lit(0.01))).as("v"))
          .localCheckpoint(true)
        // the monitor runs ONCE: the eager checkpoint inside the timed
        // block is the measured work, and the re-encode stages below
        // read the same materialized result (code-review r11 — the
        // naive shape executed the full per-(cell,dim) aggregation a
        // second time just to build cents1)
        var cents1: DataFrame = null
        val s1 = measured("cell drift monitor (flagged cells out)", sc, n) {
          cents1 = graft.substrate.IndexRefresh
            .cellShiftCorrection(e, p1.select("vec_id", "v"), assigned,
              cents0)
            .localCheckpoint(true)
          cents1.filter(col("refreshed")).count()
        }
        samples += s1.copy(showRate = false)
        def encodeCount(centSel: DataFrame): Long = {
          val resid1 = p1.join(broadcast(centSel), Seq("cell"))
            .select(col("vec_id"),
              zip_with(col("v"), col("cv"), (x, c) => x - c).as("r"))
          // force the codes column (the r10 pruning trap — see the pq
          // encode samples above)
          PqIndex.encode(resid1, "vec_id", "r", selCb, dim = 64)
            .agg(count(lit(1)), sum(element_at(col("codes"), 1)))
            .collect().head.getLong(0)
        }
        val s2 = measured("selective re-encode rows (cells%5 drifted)", sc,
          n) {
          encodeCount(cents1.filter(col("refreshed")).select("cell", "cv"))
        }
        samples += s2.copy(showRate = false)
        val s3 = measured("full re-encode rows", sc, n) {
          encodeCount(cents1.select("cell", "cv"))
        }
        samples += s3.copy(showRate = false)
      }
    }

    // ---- durable publish: bytes written ∝ drifted fraction (r12 #1) ---
    // the write-side twin of the selective-refresh rows above: after the
    // gated re-encode touches ~n/5 rows, the DURABLE publish must not
    // quietly pay the full corpus again. Rows measure the CODES dir
    // only — the corpus-sized table the claim is about; the skinny
    // per-version rewrites (codebook m·k rows, centroids |C|·dim,
    // manifest #files rows, meta) are fixed metadata whose bytes at
    // this toy scale are the same order as the 20k-row code table
    // itself (at 100 TB they are ppm of it), so folding them in would
    // measure the fixture, not the claim. `full clustered publish
    // codes bytes` is the v0 baseline (whole code table,
    // cell-partitioned); `incremental publish codes bytes` writes only
    // the changed cells' files and manifest-shares the rest — its
    // bytes must track the drifted fraction across ALL THREE decades
    // (r13, VERDICT r12 next #7; the 100× decade pays ~8.7k cells of
    // local-FS directory churn in WALL time, but the byte ratio — the
    // claim — is churn-free). The changed-cell set rides as a
    // DATAFRAME through the r13 publishIncremental overload (VERDICT
    // r12 next #4): at the 100× cell count the share split is an
    // anti-join against the manifest table, never an isin literal
    // tree. The `pairs` column carries BYTES for these rows.
    locally {
      import graft.substrate.VectorArtifact
      def dirBytes(path: String): Long = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) 0L
        else {
          def walk(d: org.apache.hadoop.fs.Path): Long =
            fs.listStatus(d).map(s =>
              if (s.isDirectory) walk(s.getPath) else s.getLen).sum
          walk(p)
        }
      }
      val pubCb = PqIndex.codebookArrays(
        PqIndex.codebooks(emb1, "vec_id", "v", dim = 64))
      Seq((emb1, nEmb1, "1x"), (emb10, nEmb10, "10x"),
        (emb100, nEmb100, "100x")).foreach {
        case (e, n, sc) =>
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_scalepub").toString
          try {
            val asg = IvfIndex.assignAuto(e, 23).select("vec_id", "cell")
              .localCheckpoint(true)
            val cents = e.filter(col("vec_id") % 23 === 0)
              .select(col("vec_id").as("cell"), col("v").as("cv"))
              .localCheckpoint(true)
            val codes = PqIndex.encode(e, "vec_id", "v", pubCb, dim = 64)
              .join(asg, Seq("vec_id")).localCheckpoint(true)
            val s1 = measured("full clustered publish codes bytes", sc, n) {
              VectorArtifact.saveClustered(spark, tmp, 0L, 64, cents,
                pubCb, codes)
              dirBytes(s"$tmp/v=0/codes")
            }
            samples += s1.copy(showRate = false)
            val changed = asg.filter(col("cell") % 5 === 0)
              .select("cell").distinct().localCheckpoint(true)
            val s2 = measured(
              "incremental publish codes bytes (cells%5 changed)",
              sc, n) {
              VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, 64,
                cents, pubCb,
                codes.join(changed, Seq("cell"), "left_semi"), changed)
              dirBytes(s"$tmp/v=1/codes")
            }
            samples += s2.copy(showRate = false)
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively()
          }
      }
    }

    emb100.unpersist() // ~100 MB; the remaining sections don't touch it

    // ---- snapshot stats pruning: files opened ∝ range, not corpus ----
    // (late r13) the manifest's committed per-file bounds plan a fixed
    // key-range scan: replicas EXTEND the key space (offset ids) while
    // per-file row width stays constant (numFiles scales with the
    // decade), so the range's matching file count is CONSTANT while the
    // version's total files grow 8 → 80 → 800 — `pairs` carries FILES
    // OPENED, the number that must stay flat. The wall includes the
    // pruned data scan itself (planning is driver-side metadata). The
    // countAt rows pin the metadata-only aggregate: `pairs` carries the
    // row COUNT (grows with the decade) while the wall stays at
    // driver-read-of-the-manifest scale at every corpus size.
    locally {
      import graft.substrate.{Layout, SnapshotStore}
      val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      def liScaled(copies: Int): DataFrame = (0 until copies).map { k =>
        if (k == 0) li1
        else li1.select((col("l_orderkey") + k * 10000000L)
          .as("l_orderkey"), col("l_quantity"))
      }.reduce(_ unionAll _)
      Seq((1, 8, "1x"), (10, 80, "10x"), (100, 800, "100x")).foreach {
        case (c, nf, sc) =>
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_scalesnap").toString
          try {
            val d = liScaled(c)
            val n = d.count()
            Layout.writeClustered(d, s"$tmp/d0", "l_orderkey",
              numFiles = nf)
            SnapshotStore.commit(spark, tmp, 0L,
              SnapshotStore.manifestForStats(spark, 0L, Seq(s"$tmp/d0"),
                Seq("l_orderkey")))
            val s1 = measured(
              s"snapshot pruned range scan files opened (of $nf)", sc, n) {
              val (surv, _) = SnapshotStore.filesWhere(spark, tmp, 0L,
                "l_orderkey", 1000L, 5000L)
              // force the pruned scan so the wall includes the data read
              SnapshotStore.readAtWhere(spark, tmp, 0L, "l_orderkey",
                1000L, 5000L).agg(count(lit(1))).head
              surv.size.toLong
            }
            samples += s1.copy(showRate = false)
            val s2 = measured("snapshot metadata-only countAt", sc, n) {
              SnapshotStore.countAt(spark, tmp, 0L)
            }
            samples += s2.copy(showRate = false)
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively()
          }
      }
    }

    // ---- bloom commit: driver rows ∝ #files; probe opens ~1 file -----
    // (r14 — VERDICT r13 what's-missing #4) the r13 bloom build
    // collected (file, word, bits) rows at #files × up-to-bits/64 words
    // scale (≈400M rows at 100k files); the r14 build OR-folds words
    // map-side and PACKS ONE SPARSE ROW PER FILE in Spark before
    // collecting. Replica decades keep per-file row width constant
    // (numFiles scales 8 → 80 → 800 with the corpus), so the claim has
    // two halves: the BUILD's driver collect is exactly #files rows
    // (`pairs` carries bloom-bearing manifest rows — must equal the
    // decade's file count, never ×words), and the PROBE's files-opened
    // stays ~1 FLAT while the version's total files grow 100×
    // (bloomBits sized for ~75k keys/file at every decade — constant
    // per-file density is what replicas preserve). Build wall grows
    // with the corpus (one scan — the same write-amplified stats
    // collection Delta performs on ingest); probe wall stays at
    // driver-metadata scale.
    locally {
      import graft.substrate.{Layout, SnapshotStore}
      val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      def liScaled(copies: Int): DataFrame = (0 until copies).map { k =>
        if (k == 0) li1
        else li1.select((col("l_orderkey") + k * 10000000L)
          .as("l_orderkey"), col("l_quantity"))
      }.reduce(_ unionAll _)
      Seq((1, 8, "1x"), (10, 80, "10x"), (100, 800, "100x")).foreach {
        case (c, nf, sc) =>
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_scalebloom").toString
          try {
            val d = liScaled(c)
              .withColumn("ukey", xxhash64(col("l_orderkey")))
            val n = d.count()
            Layout.writeClustered(d, s"$tmp/d0", "l_orderkey",
              numFiles = nf)
            val s1 = measured(
              s"snapshot bloom commit driver rows (of $nf files)", sc,
              n) {
              SnapshotStore.commit(spark, tmp, 0L,
                SnapshotStore.manifestForStatsBloom(spark, 0L,
                  Seq(s"$tmp/d0"), statsCols = Seq("l_orderkey"),
                  bloomCols = Seq("ukey"), bloomBits = 1 << 20))
              SnapshotStore.manifest(spark, tmp)
                .filter(col("bloom_ukey").isNotNull).count()
            }
            samples += s1.copy(showRate = false)
            val key = org.apache.spark.sql.catalyst.expressions
              .XxHash64Function.hash(1000L,
                org.apache.spark.sql.types.LongType, 42L)
            val s2 = measured(
              s"snapshot bloom point lookup files opened (of $nf)", sc,
              n) {
              val (surv, _) = SnapshotStore.filesWherePoint(spark, tmp,
                0L, "ukey", key)
              SnapshotStore.readAtPoint(spark, tmp, 0L, "ukey", key)
                .agg(count(lit(1))).head
              surv.size.toLong
            }
            samples += s2.copy(showRate = false)
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively()
          }
      }
    }

    // ---- inverted index: posting-row skew vs n (VERDICT r8 #2) --------
    // Replica corpora REUSE the text verbatim (unlike the dissimilar
    // shingle replicas): every token's df scales with n — the stopword
    // blowup is the phenomenon under test. UNSEG (dfThreshold=MaxValue,
    // the pre-r9 layout) must show max-posting-row growing ~n per decade
    // — the single-cell collect_list that would hit task memory and the
    // 2 GB value ceiling at 100 TB; SEG (the r9 segmented layout at a
    // width that cuts within-replica id blocks) must hold max-row ≤ W
    // FLAT across all three decades at the same build shuffle class.
    val docsRaw = docs.persist()
    def docsScaled(copies: Int): DataFrame = (0 until copies).map { k =>
      if (k == 0) docsRaw
      else docsRaw.select((col("doc_id") + k * 10000000L).as("doc_id"),
        col("text"))
    }.reduce(_ unionAll _)
    val segTh = 1000L; val segW = 2048L
    def idxMaxRow(d: DataFrame, dfTh: Long, w: Long): Long =
      graft.substrate.InvertedIndex.build(d, "doc_id", "text",
          dfThreshold = dfTh, segmentWidth = w)
        .agg(max(size(col("postings")))).head().getInt(0).toLong
    Seq((1, "1x"), (10, "10x"), (100, "100x")).foreach { case (c, sc) =>
      val d = docsScaled(c).persist()
      val n = d.count()
      val su = measured("inverted build UNSEG", sc, n) {
        idxMaxRow(d, Long.MaxValue, segW)
      }
      samples += su.copy(op = su.op + s" (max row=${su.pairs})",
        showRate = false)
      val ss = measured(s"inverted build SEG (th=$segTh, W=$segW)", sc, n) {
        idxMaxRow(d, segTh, segW)
      }
      samples += ss.copy(op = ss.op + s" (max row=${ss.pairs})",
        showRate = false)
      if (c > 1) d.unpersist()
    }

    // ---- index deletion: touched-token work vs corpus decade ----------
    // Right-to-be-forgotten on the stored index (InvertedIndex
    // .deleteDocs, r11): work is the TOUCHED tokens' postings plus the
    // batch's own tokens, never the index. Replica corpora share one
    // vocabulary, so a FIXED delete batch (drawn from replica 0)
    // touches a decade-invariant FRACTION of the vocabulary; the rows
    // must show the delete wall well under the from-scratch rebuild a
    // forget-by-rebuild deployment pays at the same decade, with
    // touched/total entries ~flat across decades.
    val delBatch = docsRaw.filter(col("doc_id") % 12 === 7).persist()
    val delBatchN = delBatch.count()
    val delToks = delBatch
      .select(explode(graft.substrate.TextOps.tokens(col("text")))
        .as("token")).distinct().persist()
    Seq((1, "1x"), (10, "10x"), (100, "100x")).foreach { case (c, sc) =>
      val d = docsScaled(c).persist()
      val n = d.count()
      // persist (not localCheckpoint) so the stored index can be FREED
      // after this decade — a checkpointed RDD would stay resident and
      // skew every later measured section's JVM
      val idx = graft.substrate.InvertedIndex.build(d, "doc_id", "text",
        dfThreshold = segTh, segmentWidth = segW).persist()
      val totalEntries = idx.agg(sum(size(col("postings"))))
        .head().getLong(0) // also forces the persist
      val touchedEntries = idx.join(delToks, Seq("token"), "left_semi")
        .agg(sum(size(col("postings")))).head().getLong(0)
      // time agg(sum(size(postings))), NOT count(1): count references no
      // aggregate output, so ColumnPruning drops the collect_list from
      // the timed plan entirely — the count()-prunes-projections trap
      // (memory: spark-timing-traps) — and the wall would exclude
      // building the output postings arrays, a dominant real cost
      val sd = measured(s"invidx deleteDocs (batch=$delBatchN)", sc, n) {
        val outEntries = graft.substrate.InvertedIndex.deleteDocs(idx,
            delBatch, "doc_id", "text",
            dfThreshold = segTh, segmentWidth = segW)
          .agg(sum(size(col("postings")))).head().getLong(0)
        require(outEntries > 0L, "delete produced an empty index")
        touchedEntries
      }
      samples += sd.copy(op = sd.op + f" (touched=${
        100.0 * touchedEntries / totalEntries}%.0f%% of $totalEntries%,d entries)",
        showRate = false)
      val sr = measured("invidx delete-by-REBUILD baseline", sc, n) {
        graft.substrate.InvertedIndex.build(
            d.join(delBatch.select("doc_id"), Seq("doc_id"), "left_anti"),
            "doc_id", "text", dfThreshold = segTh, segmentWidth = segW)
          .agg(sum(size(col("postings")))).head().getLong(0)
      }
      samples += sr.copy(showRate = false)
      idx.unpersist(true)
      if (c > 1) d.unpersist()
    }
    delToks.unpersist(); delBatch.unpersist()

    // ---- drift PSI: vocab-sized state, shuffle flat vs corpus decade --
    // Drift.categoricalPsi's at-scale claim: one linear scan per snapshot
    // folding into O(vocab) keyed state via map-side partials — the
    // shuffle column must stay ~FLAT (vocab is fixed as the corpus
    // grows; only per-partition partial counts move) while the wall
    // tracks the scan ~linearly. pairs = union-vocab rows out.
    Seq((1, "1x"), (10, "10x"), (100, "100x")).foreach { case (c, sc) =>
      val d = docsScaled(c).persist()
      val n = d.count()
      val s = measured("drift psi (token dist)", sc, n) {
        def half(m: Int) = d.filter(col("doc_id") % 2 === m)
          .select(explode(graft.substrate.TextOps.tokens(col("text")))
            .as("token"))
        graft.substrate.Drift.categoricalPsi(half(0), half(1), "token")
          .count()
      }
      samples += s.copy(op = s.op + s" (vocab=${s.pairs})", showRate = false)
      if (c > 1) d.unpersist()
    }

    // ---- MV incremental refresh: wall vs |changes| (VERDICT r8 #2) ----
    // The refresh plan's ONLY inputs are the mv aggregate (G group rows)
    // and the changelog — the base table appears nowhere, so base-row
    // independence is structural; what must be MEASURED is that the wall
    // tracks |changes| ~linearly at fixed G (the two window passes + the
    // touched-group shuffle), with only mild G sensitivity (the full
    // join against the G-row mv). pairs = refreshed group count.
    def mvRefreshRows(g: Long, nChanges: Long): Long = {
      val mv = spark.range(g).select(
        concat(lit("g"), col("id")).as("g"),
        lit(10L).as("n"), (col("id") % 1000L).cast("long").as("s"))
      val chg = spark.range(nChanges).select(
        col("id").as("k"),
        concat(lit("g"), col("id") % g).as("b_g"),
        (col("id") % 7L).cast("long").as("b_v"),
        concat(lit("g"), (col("id") + 1L) % g).as("a_g"),
        (col("id") % 11L).cast("long").as("a_v"),
        lit(1L).as("seq"))
      graft.substrate.MaterializedView.refreshSumCount(mv, chg, Seq("k"))
        .count()
    }
    samples += { val s = measured("mv refresh (G=100k)", "1x", 30000L) {
      mvRefreshRows(100000L, 30000L) }
      s.copy(op = s.op + s" (groups out=${s.pairs})", showRate = false) }
    samples += { val s = measured("mv refresh (G=100k)", "10x", 300000L) {
      mvRefreshRows(100000L, 300000L) }
      s.copy(op = s.op + s" (groups out=${s.pairs})", showRate = false) }
    samples += { val s = measured("mv refresh (G=100k)", "100x", 3000000L) {
      mvRefreshRows(100000L, 3000000L) }
      s.copy(op = s.op + s" (groups out=${s.pairs})", showRate = false) }
    // G sensitivity at fixed |changes|: the mv-side join term only
    samples += { val s = measured("mv refresh (G=1M, changes fixed)", "10x",
      300000L) { mvRefreshRows(1000000L, 300000L) }
      s.copy(op = s.op + s" (groups out=${s.pairs})", showRate = false) }

    // ---- proximity lookupNear: banded block join vs occurrence product
    // (the r9 lookupNear claim gets measured, like segmentation did).
    // Scale DOC LENGTH, not corpus size: the hazard is the stopword-dense
    // LONG document, where a bare doc_id self-join on term occurrences
    // builds occ²-per-doc rows. lookupNear's block-banded join (blk =
    // pos div slop; an anchor probes its own and the next block) emits
    // rows tracking occ × local-window density instead. Decades repeat
    // each doc's text k× (per-doc occurrences grow ~k): NAIVE join-output
    // rows must grow ~k² per decade, BANDED ~k — the wall and shuffle
    // columns follow the same split.
    locally {
      val slop = 2
      val baseProx = docsRaw.limit(200)
      def proxDocs(k: Int): DataFrame =
        if (k == 1) baseProx
        else baseProx.select(col("doc_id"),
          expr(s"array_join(array_repeat(text, $k), ' ')").as("text"))
      def occOf(d: DataFrame): DataFrame = {
        val idx = graft.substrate.InvertedIndex
          .buildPositional(d, "doc_id", "text")
        val terms = idx.select("token", "df").distinct()
          .orderBy(col("df").desc, col("token").asc).limit(3).select("token")
        idx.join(broadcast(terms), Seq("token"))
          .select(col("token"), explode(col("postings")).as("p"))
          .select(col("token"), col("p.doc_id").as("doc_id"),
            explode(col("p.positions")).as("pos"))
      }
      Seq((1, "1x"), (10, "10x"), (100, "100x")).foreach { case (k, sc) =>
        val d = proxDocs(k).persist()
        val occ = occOf(d).persist()
        val nOcc = occ.count()
        val sn = measured("near join NAIVE (occ self-join rows)", sc, nOcc) {
          occ.select(col("doc_id"), col("pos").as("apos"))
            .join(occ, Seq("doc_id")).count()
        }
        samples += sn.copy(showRate = false)
        val sb = measured(s"near join BANDED (slop=$slop) rows", sc, nOcc) {
          val anchors = occ.select(col("doc_id"), col("pos").as("apos"),
              explode(array(lit(0L), lit(1L))).as("boff"))
            .select(col("doc_id"), col("apos"),
              (expr(s"apos div $slop") + col("boff")).as("blk"))
          val occB = occ.withColumn("blk", expr(s"pos div $slop"))
          anchors.join(occB, Seq("doc_id", "blk")).count()
        }
        samples += sb.copy(showRate = false)
        occ.unpersist(); d.unpersist()
      }
    }

    // ---- MV MIN/MAX refresh: touched-group re-agg, never the full base
    // (refreshMinMax — the non-invertible aggregates CANNOT ride the
    // delta fold, so the contract is different from `mv refresh` above:
    // cost O(touched groups' base rows) + one filtered base scan, and
    // NO shuffle of base — untouched mv rows pass through by anti-join,
    // touched groups re-aggregate behind a broadcast semi join). The
    // touched decades at fixed base must show shuffle tracking the
    // touched set while the wall stays scan-bound; the 10×-base row at
    // FIXED touched set must show shuffle ~flat (only touched rows ever
    // shuffle) — the wall's scan growth is the cost a bucketed/
    // partitioned-by-g base prunes away in production.
    def mvMinMaxRows(baseRows: Long, g: Long, touched: Long): Long = {
      val mvBase = spark.range(baseRows).select(
        concat(lit("g"), col("id") % g).as("g"),
        (col("id") % 1000L).cast("long").as("v"))
      val mv = spark.range(g).select(
        concat(lit("g"), col("id")).as("g"),
        lit(0L).as("mn"), lit(999L).as("mx"))
      val chg = spark.range(touched).select(
        concat(lit("g"), col("id")).as("b_g"),
        concat(lit("g"), col("id")).as("a_g"))
      graft.substrate.MaterializedView.refreshMinMax(mv, mvBase, chg).count()
    }
    Seq((1000L, "1x"), (10000L, "10x"), (100000L, "100x")).foreach {
      case (t, sc) =>
        val s = measured("mv minmax refresh (B=3M, G=100k)", sc, t) {
          mvMinMaxRows(3000000L, 100000L, t) }
        samples += s.copy(op = s.op + s" (touched=$t)", showRate = false)
    }
    locally {
      val s = measured("mv minmax refresh (B=30M, touched fixed)", "10x",
        10000L) { mvMinMaxRows(30000000L, 100000L, 10000L) }
      samples += s.copy(op = s.op + " (touched=10000)", showRate = false)
    }

    // ---- distributed components: rounds vs log2(diameter) -------------
    // (VERDICT r3 #7) A CHAIN is the worst-case-diameter graph; edge
    // counts above Graph.LocalThreshold force the distributed pointer-
    // doubling path. The claim under test: convergence rounds grow with
    // log2(diameter) — ~+3.3 rounds for a 10× longer chain, never 10×.
    def chain(nEdges: Long, scale: String): Sample = {
      val e = spark.range(nEdges)
        .select(col("id").cast("long").as("src"),
          (col("id") + 1).cast("long").as("dst"))
      var rounds = 0
      val s = measured("components chain", scale, nEdges) {
        val (labels, r) = graft.substrate.Graph
          .componentsDistributedWithRounds(e, maxIters = 40)
        rounds = r
        labels.filter(col("label") === 0L).count() // one component, min id 0
      }
      s.copy(op = "components chain (rounds=" + rounds +
        f", log2(diam)=${math.log(nEdges.toDouble) / math.log(2)}%.1f)",
        showRate = false)
    }
    samples += chain(150000L, "1x")
    samples += chain(1500000L, "10x")
    // third decade (VERDICT r4 #3): rounds must grow ~log2, never linearly
    samples += chain(15000000L, "100x")

    // ---- stream-stream attribution: state vs stream length ------------
    // (VERDICT r3 #7) The interval join buffers only watermark+window
    // TIME's worth of rows per side. Same event RATE, 10× longer stream:
    // max buffered state must stay FLAT (bounded by rows-in-20min × 2
    // sides) while total input grows 10× — state is O(window), not O(n).
    def attributionState(spanMin: Int, scale: String): Sample = {
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val ratePerMin = 200
      val batchMin = 20
      val nBatches = spanMin / batchMin
      val perBatch = ratePerMin * batchMin
      val trig = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val conv = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val joined = graft.streaming.FreshnessMonitor.attributionJoin(
        trig.toDF().toDF("user_id", "ts"), conv.toDF().toDF("user_id", "ts"))
      val q = joined.writeStream.format("memory")
        .queryName(s"attr_scale_$scale").outputMode("append").start()
      var maxState = 0L
      val s = measured("attribution join", scale, 2L * ratePerMin * spanMin) {
        try {
          val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
          (0 until nBatches).foreach { b =>
            val rows = (0 until perBatch).map { i =>
              val t = base + b.toLong * batchMin * 60000L +
                i.toLong * batchMin * 60000L / perBatch
              (i.toLong % 5000, new java.sql.Timestamp(t))
            }
            trig.addData(rows)
            conv.addData(rows.map { case (u, t) =>
              (u, new java.sql.Timestamp(t.getTime + 300000L)) }) // +5 min
            q.processAllAvailable()
            val p = q.lastProgress
            if (p != null) p.stateOperators.foreach(so =>
              maxState = math.max(maxState, so.numRowsTotal))
          }
          maxState
        } finally q.stop() // never leak a running query into later samples
      }
      s.copy(op = f"attribution join (max state=$maxState%,d rows)",
        showRate = false)
    }
    samples += attributionState(120, "1x")
    samples += attributionState(1200, "10x")

    val all = samples.result()
    // table rows are appended OUTSIDE stripMargin (their leading '|' would
    // otherwise be treated as a margin and stripped)
    val head =
      s"""# SCALE — empirical rehearsal of the dedup/ANN/search/MV tier
         |
         |`runMain graft.tools.ScaleRehearsal` on `$sfDir` (1×) and
         |deterministic 10×/100× replica corpora (mutually-dissimilar
         |replicas — see ScaleRehearsal.scala; the 100× decade runs for the
         |claims that extrapolate furthest: auto-width candidate rates and
         |components rounds). Candidate RATE = candidate pairs /
         |C(n,2): the sub-quadratic claim is that rate falls as n grows
         |(fixed bands) or is held near-zero by widening bands.
         |
         |""".stripMargin +
        "| operator | scale | n | pairs/rows | cand rate | wall s | shuffle MB |\n" +
        "|---|---|---|---|---|---|---|\n" +
        all.map(_.row).mkString("\n") + "\n"
    val md = head +
      s"""
         |Reading the numbers:
         |
         |- **MinHash LSH**: band keys live in an effectively unbounded hash
         |  space, so buckets don't crowd as n grows — candidate count grows
         |  ~linearly (rate drops ~10×ish at 10×) and verified near-dup pairs
         |  stay exactly the within-replica ones. This is the property that
         |  holds at 100 TB: work scales with true-duplicate density, not n².
         |- **Incremental**: the delta-vs-index row matches a 10% slice
         |  against the stored signatures of the other 90% — the nightly
         |  ingest shape. Wall and shuffle track the DELTA, not the corpus:
         |  at 100 TB the index side is a precomputed table
         |  (MinHashLsh.signatures) and only the batch hashes fresh.
         |  `dedup_ingest_stream` rides exactly this shape per micro-batch
         |  (nearDupPairsAgainstIndex: the stored signature table IS the
         |  index side), so its per-batch cost is this row's at |batch|
         |  instead of |delta| — no separate decade rows by design.
         |- **Sign-LSH**: 8-bit bands have only 256 buckets/band, so bucket
         |  occupancy — and the candidate rate — is roughly CONSTANT in n:
         |  fixed-width bands are quadratic in the limit. The documented knob
         |  (bandBits; nPlanes stays a multiple) restores sub-quadratic
         |  growth: the 16-bit row shows the rate collapsing at the same n.
         |  Since r4 the policy bandBits = clamp(ceil_log2(n) − 4, 6, 24) IS
         |  the default (CosineSignLsh.autoBandBits, one corpus count, no
         |  knob; oracle SQL derives the same width via a CASE ladder) — the
         |  three `auto` rows must show the rate FALLING across 1× → 10× →
         |  100×: a three-point trend, not a two-point line. The 100× fall
         |  is real but dampened vs uniform-bucket theory: the replica
         |  corpus is 100 subpopulations each carrying its own (scrambled)
         |  mean, and ONE global centering cannot de-skew them all — biased
         |  bits crowd within-replica buckets. A production corpus mixing
         |  genuinely distinct populations wants per-shard centering (hash
         |  the shards separately); a single-population corpus centers
         |  clean, as the 1×/10× decades show. Since r5 the remedy is
         |  IMPLEMENTED — `CosineSignLsh.nearDupPairsSharded` centers each
         |  shard on its own mean (offsets = per-shard AVG of the raw
         |  plane dots; dot commutes with the mean, so there is no
         |  mean-vector pass) and keeps candidates within shards — and
         |  MEASURED here: the `sign_lsh SHARDED` rows shard the replica
         |  corpus by replica id and must sit well below the
         |  global-centered `auto` rows at the same scale, with FEWER
         |  bits (width derives from the largest shard). ShardedLshSpec
         |  pins the skew collapse on a 2-subpopulation fixture and
         |  `neardup_cosine_sharded` oracles the pipeline in DuckDB.
         |- **IVF**: centroids scale with n (fixed centroidMod), so mean cell
         |  size is constant and probe cost per query is flat; assignment is
         |  one broadcast-centroids pass over the corpus per (re)build.
         |- **Semantic dedup** (`dedup_semantic` / `dedup_semantic_hier`):
         |  constant cell occupancy keeps the within-cell pair term linear —
         |  the pair RATE must fall ~10× per decade across all three flat
         |  rows. The quadratic hides in FLAT assignment (n·|C| distance
         |  evals, |C| = n/23): compare the flat and auto WALLS at 100× —
         |  the registered default (IvfIndex.assignAuto) derives its coarse
         |  budget f = √|C| from one centroid count and pays
         |  n·(|C|/f + 4·f) ≈ O(n·√|C|) instead, the classic
         |  IVF-on-centroids shape. Pair counts differ between the two only
         |  by probe-miss reassignment among near-tied cells;
         |  SemanticDedupSpec pins that planted near-dups still co-route
         |  (recall 0.90 at sf0.1) and the dedup_semantic /
         |  dedup_semantic_hier DuckDB oracles reproduce every routing
         |  tie-break bit-for-bit, deriving the same f in SQL.
         |- **§IVF assignment work** (`ivf assign evals` rows — VERDICT r6
         |  #4): exact-distance-evaluation rows per vector, counted from
         |  the real candidate-join cardinalities of the three assignment
         |  paths. FLAT pays |C| = n/23 evals/vec — grows ~10× per decade
         |  (the witness `dedup_semantic_flat` keeps this shape on the
         |  books). AUTO (assignAuto, the registered default) pays
         |  |coarse| + routed-fine candidates ≈ 2√|C| + centroid-routing
         |  amortization — the /vec column must grow ~√10 ≈ 3.2× per
         |  decade. ROUTED (assignRouted, `dedup_semantic_routed`) routes
         |  through occupancy-targeted BRP buckets: candidates/vec are
         |  bounded by nTables·(2·probe+1)·occupancy/centroidMod — the
         |  /vec column must stay ~FLAT across all three decades (plus the
         |  measured miss-set × |C| fallback, near-zero by occupancy
         |  targeting, and nTables hash dots/vec of map-side multiply-add
         |  routing work not counted as distance evals).
         |- **BRP multi-probe**: value-space buckets (floor(dot/L)) — with
         |  a FIXED L the occupied-bucket count follows the data spread, not
         |  n, so the candidate rate sits ~constant (quadratic limit, like
         |  fixed sign-LSH bands; the L=2e5 rows keep that shape on record,
         |  and the L/4 row shows the width knob cutting the rate at the
         |  same n). Since r5 the DEFAULT is the auto policy (BrpLsh
         |  .autoBucketLengths: L_t = spread_t × occupancy / n per table,
         |  mirrored in check #19's oracle CTEs): bucket count grows with n,
         |  so the three `auto` rows must show the rate FALLING 1× → 10× →
         |  100×. The occupancy default is generous because #19's corpus is
         |  isotropic background (exact top-10 barely nearer than random),
         |  where ANY sub-linear candidate set caps recall — the curse of
         |  dimensionality, not an index defect; real corpora with neighbor
         |  structure run occupancy ~8-16 and keep both.
         |- **IVF-PQ probed scan** (`ivfpq probed candidates` rows — the r9
         |  IvfPq composition): candidates per query must stay ~FLAT
         |  (≈ nProbe × mean cell size; cells grow in COUNT with n at
         |  fixed centroidMod, not in size) across all three decades —
         |  the full-ADC witness (PqIndex.topK) pays n per query by
         |  construction, so the flat /query column IS the reason the
         |  composition exists. Candidate-set cardinality is counted at
         |  the exact probe-join shape IvfPq.topK scans (codes join adds
         |  the m-byte payload, not rows).
         |- **PQ PROD codebook knob tradeoff** (the `pq encode codes PROD
         |  k=256` rows above prove the plan shape; the QUALITY knob table —
         |  recall@10 at sf0.1 against the exact euclidean oracle, measured
         |  via the registered recall entries + the same arithmetic swept in
         |  DuckDB): 4-bit k=16 codes (4 B/vec at m=8) = 0.145 ADC / 0.39
         |  depth-50 rerank; k=64 (6 bits) = 0.52 reranked; 8-bit k=256
         |  (8 B/vec) = 0.69; + full-corpus training = 0.75; + depth-100
         |  rerank = 0.89; + 3 Lloyd rounds = **0.93**
         |  (`retrieval_recall_pq_prod`, meets the 0.8 SLA #19 holds BRP to);
         |  m=16·k=256 (16 B/vec) reaches 0.9975 — the next knob if the SLA
         |  ever rises. Rerank depth trades |Q|·depth exact point lookups for
         |  recall; codebook k trades training cost (bounded, O(sample·k))
         |  and LUT size (m·k per query) — NEVER scan shape: encode stays
         |  exchange-free and the ADC scan stays m lookups/candidate at
         |  every k. `vector_ingest_stream` is this encode shape applied
         |  per micro-batch against the frozen codebook (stateless — no
         |  state store, no shuffle), so streamed ingest inherits the
         |  flat-shuffle decade rows verbatim.
         |- **Residual IVF-PQ — the DEPLOYED path at its SLA** (r11,
         |  `retrieval_recall_ivfpq_prod`; no separate decade rows by
         |  design — its probed scan IS the measured `ivfpq probed
         |  candidates` shape with the per-(query, probed-cell) residual
         |  LUT replacing the per-query one, |Q|·nProbe·m·k skinny
         |  broadcast rows): residual encoding (codes quantize
         |  v − centroid(cell); FAISS by_residual=true) plus a
         |  neighbor-structured planted corpus at ~5× inter/intra margin
         |  close the r10 gap between "full-ADC meets 0.8" and "the pruned
         |  path serves 0.22". Measured at sf0.1 through nProbe=8 of ~87
         |  cells (~9% of the code table per query): cell_recall 1.0,
         |  residual ADC 0.51, depth-100 rerank **1.0** — `meets_sla`
         |  hash-checked. The probe-budget curve
         |  (`retrieval_recall_ivfpq_probes`: 0.69 → 0.99 → 1.0 → 1.0 at
         |  nProbe 2/4/8/16) SATURATES once probes cover a cluster's cell
         |  complement — the knee that picks ProdNProbe=8, unlike the
         |  isotropic sweep that climbs forever.
         |- **Selective refresh — O(drifted-fraction) maintenance** (r11,
         |  `index_refresh_selective`; decade rows above: `cell drift
         |  monitor` + `selective re-encode rows` vs `full re-encode
         |  rows`): per-cell mean-shift monitors over the STORED
         |  assignment flag drifted cells; the repair adds the measured
         |  mean-shift vector to the flagged cells' serving centroids
         |  (codebook FROZEN — retraining would orphan every code) and
         |  re-encodes only those cells' rows. The decade rows must show
         |  selective rows tracking ~n/5 while full pays n, with the
         |  monitor's output |C|-scale at every decade. The registered
         |  entry measures the quality half at sf0.1: serving recall
         |  parity with the full twin (0.529 vs 0.508, hash-checked
         |  boolean) vs stale 0.432, 19.9% of rows re-encoded, 66% exact
         |  code agreement (clean-cell jitter flips borderline k=256
         |  Voronoi assignments — why parity, not code equality, is the
         |  claim).
         |- **Incremental durable publish — bytes ∝ drifted fraction**
         |  (r12, `ann_stored_index_incremental`; decade rows above:
         |  `full clustered publish codes bytes` vs `incremental publish
         |  codes bytes`, the `pairs` column carrying BYTES): the
         |  selective refresh's compute saving used to be followed by a
         |  100% durable rewrite (VERDICT r11 what's-missing #1) — now
         |  VectorArtifact keeps a per-version FILE MANIFEST and
         |  `publishIncremental` writes only the changed cells' files,
         |  pinning every untouched cell's file from the ancestor
         |  version. The incremental rows must track the ~1/5 changed
         |  fraction of the full codes bytes at each decade (per-file
         |  parquet footers scale with the changed FILE count, so they
         |  keep the ratio honest). Rows measure the codes dir only: the
         |  per-version skinny rewrites (codebook, |C|·dim centroids,
         |  manifest, meta) are fixed metadata that at this toy scale
         |  rival the 20k-row code table itself — at 100 TB they are ppm
         |  of it, and folding them in would measure the fixture. The
         |  100× decade (r13) pays ~8.7k cells of local-FS directory
         |  churn in WALL time — at 100 TB the cells are object-store
         |  prefixes — but the byte RATIO is churn-free and must hold
         |  ≈0.2 there too. Since r13 the changed-cell set rides as a
         |  DataFrame (the publishIncremental overload): the share split
         |  is an anti-join against the manifest table, so the 100×
         |  cell count never becomes an isin literal tree or an O(F·C)
         |  driver scan.
         |  Vacuum/retire stay safe under sharing (anti-join over retained
         |  manifests — VectorArtifactSpec pins a child serving through
         |  its vacuumed ancestor's files). The streaming twin
         |  (`vector_ingest_publish_stream`) appends batch files to the
         |  manifest chain with ZERO ancestor rewrite — its durable cost
         |  is O(batch) by construction.
         |- **Snapshot file skipping** (late r13, `snapshot pruned range
         |  scan files opened` rows, the `pairs` column carrying FILES
         |  OPENED; entries `snapshot_read_pruned` /
         |  `snapshot_count_meta` / `snapshot_delete_commit`): commits
         |  record per-file row counts and key bounds from the parquet
         |  footers (`manifestForStats` — driver-side, O(#files), the
         |  Iceberg/Delta stats shape), and a fixed key-range read plans
         |  through them. The replicas EXTEND the key space while
         |  per-file row width stays constant, so the files-opened count
         |  must stay FLAT (1) while the version's total files grow
         |  8 → 80 → 800 — scan I/O ∝ the range, not the corpus, with
         |  planning that never lists directories or reads footers at
         |  query time. The `metadata-only countAt` rows pin the
         |  catalog-lookup aggregate: the count (`pairs`) grows with the
         |  decade while the wall stays at driver-manifest-read scale —
         |  zero data files opened at any corpus size. The same bounds
         |  bound the GOVERNANCE DELETE's write side (`deleteCommit`
         |  rewrites only bound-intersecting files; the share split is a
         |  broadcast anti-join on the manifest, metadata-scale) and the
         |  MERGE commit's (`mergeCommit` plans rewritten files by
         |  binary-searching the changelog's sorted keys against each
         |  file's bounds — O(#files · log |batch|) driver arithmetic).
         |  The MERGE-ON-READ delete (`deleteCommitMor`, entry
         |  `snapshot_delete_dv`) needs no decade rows by design: its
         |  commit writes ONE O(batch) sidecar and carries the ancestor
         |  manifest verbatim — write I/O is corpus-INDEPENDENT — and
         |  its read-side cost is one broadcast anti-join per sidecar
         |  over scans the other rows already bound. The r15 MoR family
         |  inherits the same corpus-independence by construction:
         |  `mergeCommitMor` (entry `snapshot_merge_mor`) writes one
         |  key sidecar plus image files ∝ the changelog's surviving
         |  rows — zero ancestor files touched at ANY corpus size, the
         |  cost the CoW `mergeCommit` decade rows bound moved entirely
         |  to the maintenance window; the vector store's
         |  `deletePublishMor` (entry `ann_stored_index_delete_dv`)
         |  writes one vec_id sidecar regardless of how many cells the
         |  batch scatters across (the CoW `deletePublish` rewrote
         |  O(affected cells) files — for a scattered batch, ~the whole
         |  code table). The row-level CDF (`readChangesBetween`, entry
         |  `snapshot_cdf_read`; composite keys via
         |  `snapshot_cdf_composite`, r16) composes per step from the
         |  SAME bounded pieces: an append step reads exactly the
         |  delta's files (spec-pinned: zero base files in the plan), a
         |  sidecar step reads the bounds-PRUNED carried slice, and only
         |  a materialize/compaction step pays a full diff — the
         |  maintenance-window cost, and it emits zero events. The
         |  carried-file prune is DISTRIBUTED since r16 (VERDICT r15
         |  what's-wrong #1): the sidecar keys never collect to the
         |  driver — two executor-side aggregates (global [min,max],
         |  then the occupied bins of a grid sized to the carried-file
         |  count) deliver O(#files) longs of coverage metadata, so a
         |  100 M-key CDC window costs the driver the same as a 100-key
         |  forget; bin granularity only ever KEEPS more files, and the
         |  broadcast semi-join downstream decides row membership
         |  exactly. Sidecar writes fan out at ~4M keys/file (both
         |  stores) so a changelog-scale sidecar never funnels through
         |  one write task; long resume windows STRIDE automatically
         |  (grouped local-checkpointed folds past 16 commit steps —
         |  O(steps/stride) plan leaves on a 500-commit catch-up). The
         |  POSITIONAL delete (`deleteCommitPos`, entry
         |  `snapshot_delete_pos`, r16) trades one bounded
         |  coverage-pruned scan at commit for exact (file, row_index)
         |  sidecars — so `countAt` stays a metadata-only catalog
         |  lookup THROUGH pending forgets (sum of committed row
         |  counts minus sidecar footer counts), at any corpus size.
         |- **Bloom commit build + probe** (r14, `snapshot bloom commit
         |  driver rows` / `snapshot bloom point lookup files opened`
         |  rows — VERDICT r13 what's-missing #4): the r13 build
         |  collected (file, word, bits) rows at #files × up-to-4096
         |  words scale (~400M rows at 100k files); the r14 build packs
         |  ONE SPARSE ROW PER FILE inside Spark, so the driver collect
         |  is exactly #files rows — `pairs` equals the decade's file
         |  count (8 / 80 / 800), never ×words — and footer stats now
         |  read through a ≤16-thread pool instead of one sequential
         |  round-trip per file. The probe rows pin the read side: a
         |  point lookup on a layout-uncorrelated hashed key opens ~1
         |  file FLAT while the version's total files grow 100× (bloom
         |  density is per-file, and replicas keep per-file key count
         |  constant — the deployment knob a committer controls).
         |- **PQ rerank / frozen-codebook ingest** (no separate rows by
         |  design): `retrieval_recall_pq_rerank`'s second stage adds |Q|·depth
         |  exact-distance point lookups on top of the measured ADC scan — a
         |  constant per query, corpus-independent (the `pq encode` and `ivfpq
         |  probed` decades bound the stages that DO grow); `ann_ivf_incremental`
         |  runs the already-measured AUTO assignment work (`ivf assign evals
         |  AUTO` rows) over the DELTA only — per-batch cost is the measured
         |  per-vector work × |delta|, with the base untouched beyond its stored
         |  centroid rows.
         |- **Filtered ANN** (`ann_ivf_filtered`, no separate rows by design):
         |  its candidate scan IS the measured `ivf_topk` probe shape
         |  intersected with a predicate semi join — the filter only SHRINKS
         |  the per-query candidate set the `ivf_topk` / `ivfpq probed` decades
         |  already bound above, and adds no join whose width grows with n
         |  (the keep-list is broadcast when selective, and at scale becomes a
         |  pushed-down metadata predicate on the cell-partitioned code table).
         |- **Drift PSI** (`drift psi` rows): population monitors must be
         |  readable at every corpus size — one scan per snapshot folding
         |  into O(vocab) keyed state via map-side partial aggregation.
         |  The shuffle column must stay ~flat across the decades (only
         |  per-partition partial counts move; vocab is fixed) while the
         |  wall tracks the scan — the shape that lets a 100 TB pre-train
         |  corpus be drift-gated nightly.
         |  The binned NUMERIC variant (`numeric_drift_psi`) shares this shape
         |  exactly — its only extra is the decile-edge derivation, a rank
         |  window over the O(sample) id-sample of the reference (never the
         |  corpus), after which binning is the same one-scan fold into
         |  O(nBins) state.
         |- **Inverted index** (`inverted build` rows — VERDICT r8 #2): the
         |  replica corpora reuse the text verbatim, so every token's df
         |  grows with n — the stopword skew that matters at 100 TB. The
         |  UNSEG rows (dfThreshold=MaxValue, the pre-r9 single-cell
         |  layout) must show max-posting-row growing ~10× per decade —
         |  the curve that ends in a task-OOM against the 2 GB value
         |  ceiling; the SEG rows (the registered segmented layout,
         |  postings split by doc_id range above the df threshold) must
         |  hold max-row ≤ W FLAT across all three decades with the same
         |  one-explode + groupBy(token, segment) shuffle class — the
         |  segment key is also what splits a hot token across reducers
         |  instead of crowding one. Lookup/BM25/phrase read both layouts
         |  identically (InvertedIndexSpec), so the bound is free at query
         |  time.
         |- **Index deletion** (`invidx deleteDocs` rows, r11): the
         |  right-to-be-forgotten act on the stored index. The fixture
         |  corpus has a ~31-token fixed vocabulary, so ANY realistic
         |  batch touches 100% of tokens (the op label records it) —
         |  the WORST case for the touched-token design — and the rows
         |  still separate cleanly: the delete's input is the STORED
         |  index plus the batch, never the corpus, and its executed
         |  plan is ZERO-shuffle (stage metrics: one pass over the
         |  stored index, the batch broadcast twice, shuffle write ≈ 0
         |  vs the rebuild's 585 MB at 100×) because the stored index
         |  is already partitioned by its group keys — each postings
         |  row explodes, drops deleted ids, and re-aggregates WITHOUT
         |  leaving its partition (hash(token) satisfies the re-agg's
         |  clustered distribution), the same property a token-bucketed
         |  stored table gives a cluster. Walls: 0.7/1.0/1.5 s vs the
         |  from-scratch REBUILD's 0.9/2.7/15.8 s — ~10× at 100× and
         |  widening with the decade. On a real Zipf-tailed vocabulary
         |  the anti-join pass-through (PlanQualitySpec gates the plan
         |  shape) adds the saving this fixed word list cannot exhibit:
         |  untouched tokens — most of a real vocab — skip the rewrite
         |  entirely. The vector twin (`vector_index_delete`) needs no
         |  rows: dropping code rows is one broadcast anti join over
         |  the linear `pq encode` shape already measured above.
         |- **MV incremental refresh** (`mv refresh` rows — VERDICT r8 #2):
         |  the refresh plan's inputs are the G-row mv aggregate and the
         |  changelog ONLY — the base table appears nowhere in the plan,
         |  so base-ROW independence (the 100 TB claim: refresh cost
         |  scales with the delta, never the re-scan) is structural, and
         |  what the decades measure is the rest of the contract: wall
         |  tracks |changes| ~linearly at fixed G (two window passes over
         |  the change keys + one touched-group shuffle), and the G=1M row
         |  pins the mv-side term (the full join against G group rows) as
         |  mild — at production scale G (distinct groups) is orders below
         |  base rows, which is why an MV exists at all.
         |- **Proximity retrieval** (`near join` rows — the r9 lookupNear
         |  banded-join claim, measured): decades scale DOC LENGTH (text
         |  repeated k×, per-doc occurrences ~k) because the at-scale
         |  hazard is the stopword-dense long document, not corpus count.
         |  The NAIVE rows (bare doc_id self-join on term occurrences —
         |  the oracle's BETWEEN recomputation shape) must grow ~k² per
         |  decade; the BANDED rows (blk = pos div slop equi-join,
         |  lookupNear's registered plan) must grow ~k — per-key join
         |  width is the slop-window's local density, so the plan never
         |  builds the per-doc occurrence product the naive shape pays.
         |- **MV MIN/MAX refresh** (`mv minmax refresh` rows): the
         |  non-invertible aggregates cannot ride the SUM/COUNT delta
         |  fold (MaterializedView scaladoc), so refreshMinMax
         |  re-aggregates only the TOUCHED groups behind a broadcast
         |  semi join while untouched mv rows anti-join through. The
         |  touched decades at fixed base show shuffle tracking the
         |  touched set with a scan-bound wall; the 10×-base row at
         |  fixed touched set must hold shuffle ~FLAT — base rows are
         |  scanned (prunable by bucketing/partitioning on g in
         |  production) but never shuffled.
         |- **Components chain**: worst-case diameter (a path), forced onto
         |  the distributed pointer-doubling path. Rounds must track
         |  log2(diameter) (~+3.3 per decade, across all three decades to
         |  15M edges) — a linear-propagation implementation would need 10×
         |  the rounds per decade and stall at 100 TB graph depth.
         |- **Attribution join state**: same event rate, 10× longer stream —
         |  max buffered state (numRowsTotal) must stay ~flat at
         |  rows-in-(watermark+window) × 2 sides (≈ 200/min × 20 min × 2 =
         |  8,000), while input grows 10×: stream state is O(window·rate),
         |  never O(stream length).
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.getBytes("UTF-8"))
    println(s"[scale] wrote $outMd")
    spark.stop()
  }
}
