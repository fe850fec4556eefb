package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.substrate.{CosineSignLsh, IvfIndex, MinHashLsh, VectorOps}

/** Empirical scale rehearsal for the dedup/ANN tier (VERDICT r2 #6): runs
  * the sub-quadratic candidate generators on 1× and 10× corpora and
  * records candidate-pair counts, candidate RATE (pairs / C(n,2)), wall
  * time, and shuffle bytes — validating that the banded/bucketed designs
  * hold up when the data grows, and quantifying the band-width knob that
  * keeps them sub-quadratic at 100 TB.
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
      wallSec: Double, shuffleMb: Double) {
    def rate: Double =
      if (n < 2) 0.0 else pairs.toDouble / (n.toDouble * (n - 1) / 2)
    def row: String =
      f"| $op | $scale | $n%,d | $pairs%,d | ${rate * 100}%.4f%% | $wallSec%.1f | $shuffleMb%.0f |"
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
    // sign-scramble: s(k,d) = ±1 from the same integer-hash family as the
    // LSH planes; k=0 keeps the original corpus
    val emb10 = (0 until 10).map { k =>
      if (k == 0) emb1
      else emb1.select((col("vec_id") + k * 10000000L).as("vec_id"),
        expr(s"transform(v, (x, d) -> CASE WHEN (($k * 64 + d) * 2654435761 + 123) % 2 = 0 THEN x ELSE -x END)")
          .as("v"))
    }.reduce(_ unionAll _).persist()

    val nDocs1 = shingles1.select("doc_id").distinct().count()
    val nDocs10 = shingles10.select("doc_id").distinct().count()
    val nEmb1 = emb1.count(); val nEmb10 = emb10.count()

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

    val all = samples.result()
    // table rows are appended OUTSIDE stripMargin (their leading '|' would
    // otherwise be treated as a margin and stripped)
    val head =
      s"""# SCALE — empirical rehearsal of the dedup/ANN tier
         |
         |`runMain graft.tools.ScaleRehearsal` on `$sfDir` (1×) and a
         |deterministic 10× replica corpus (mutually-dissimilar replicas —
         |see ScaleRehearsal.scala). Candidate RATE = candidate pairs /
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
         |- **Sign-LSH**: 8-bit bands have only 256 buckets/band, so bucket
         |  occupancy — and the candidate rate — is roughly CONSTANT in n:
         |  fixed-width bands are quadratic in the limit. The documented knob
         |  (bandBits; nPlanes stays a multiple) restores sub-quadratic
         |  growth: the 16-bit row shows the rate collapsing at the same n.
         |  Policy at scale: bandBits ≈ log2(n) − 4, i.e. 16-24 bits for
         |  1e6-1e9 vectors, rerank unchanged.
         |- **IVF**: centroids scale with n (fixed centroidMod), so mean cell
         |  size is constant and probe cost per query is flat; assignment is
         |  one broadcast-centroids pass over the corpus per (re)build.
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.getBytes("UTF-8"))
    println(s"[scale] wrote $outMd")
    spark.stop()
  }
}
