package graft

import org.apache.spark.sql.functions._

import graft.substrate.TextOps

/** Correctness of the dedup family on CONSTRUCTED near-duplicates — the
  * driver corpus has none (500 distinct random texts), so known-answer
  * fixtures live here.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private val nearDup = base.replace("tonight", "today") // 1-word edit
  private val different = "completely unrelated content about database systems and query planning here now"

  private def corpus = Seq(
    (0L, base), (1L, nearDup), (2L, different), (3L, base) // 3 = exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup maps duplicate text to the canonical min doc_id") {
    val d = corpus.select(col("doc_id"),
      sha2(TextOps.normText(col("text")).cast("binary"), 256).as("h"))
    val canon = d.groupBy("h").agg(min("doc_id").as("c"), count(lit(1)).as("n"))
      .filter(col("n") > 1).select("c").as[Long].collect()
    assert(canon.toSeq == Seq(0L))
  }

  test("trigram Jaccard: near-dup pair scores high, unrelated pair absent") {
    val sh = corpus.select(col("doc_id"), explode(TextOps.wordTrigrams(col("text"))).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh2")),
        col("sh") === col("sh2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    val ji = inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("ji"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(ji((0L, 3L)) == 1.0)      // exact dup
    assert(ji((0L, 1L)) > 0.6)       // near dup: 1-word edit in 13 words
    assert(!ji.contains((0L, 2L)))   // unrelated: no shared trigram
  }

  test("banded MinHash LSH finds near-dup pairs with exact Jaccard, skips unrelated") {
    val sh = corpus.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    val pairs = graft.substrate.MinHashLsh.nearDupPairs(sh, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((0L, 3L)) == 1.0)              // exact dup, Jaccard 1
    assert(pairs.get((0L, 1L)).exists(_ > 0.6)) // near dup banded into a shared bucket
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("incremental LSH: delta matches corpus near-dups, never corpus-vs-corpus") {
    import graft.substrate.{MinHashLsh, TextOps}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet gray")).toDF("doc_id", "text")
    val delta = Seq(
      (101L, "beta gamma delta epsilon zeta eta theta"), // near-dup of 1
      (102L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    val pairs = MinHashLsh.nearDupPairsAgainst(sh(delta), sh(corpus),
        numPerms = 8, bandRows = 2, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // only the planted (delta, corpus) pair; docs 2/3 similar to nothing,
    // and corpus-internal pairs are never compared
    assert(pairs == Set((101L, 1L)))
  }

  test("deleteDocs: a forgotten doc never surfaces from the stored index; survivors still match; delete == rebuild") {
    import graft.substrate.{MinHashLsh, TextOps}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet gray"))
      .toDF("doc_id", "text")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    val csh = sh(corpus).localCheckpoint(true)
    val sigs = MinHashLsh.signatures(csh, 8).localCheckpoint(true)
    // forget doc 1, then ingest near-dups of BOTH doc 1 (forgotten) and
    // doc 2 (retained) — the re-upload-of-forgotten-content hazard
    val (sigs2, csh2) = MinHashLsh.deleteDocs(sigs, csh,
      Seq(1L).toDF("doc_id"))
    val delta = Seq(
      (101L, "beta gamma delta epsilon zeta eta theta"), // near-dup of 1
      (102L, "two three four five six seven eight nine")) // near-dup of 2
      .toDF("doc_id", "text")
    val pairs = MinHashLsh.nearDupPairsAgainstIndex(sh(delta), sigs2, csh2,
        numPerms = 8, bandRows = 2, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((102L, 2L)),
      s"forgotten doc 1 must never surface, survivor 2 must: $pairs")
    // delete-from-index ≡ rebuilding the index from the remaining docs
    val rebuilt = MinHashLsh.nearDupPairsAgainst(sh(delta),
        sh(corpus.filter(col("doc_id") =!= 1L)),
        numPerms = 8, bandRows = 2, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == rebuilt)
    // the stores really dropped the rows (O(deleted) state, not a mask)
    assert(sigs2.filter(col("doc_id") === 1L).isEmpty &&
      csh2.filter(col("doc_id") === 1L).isEmpty)
  }

  test("incremental LSH: includeSameId surfaces a changed re-ingest under a stable id") {
    import graft.substrate.{MinHashLsh, TextOps}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    // doc 1 re-ingested with one edit: same id, drifted content
    val delta = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    // default: the same-id pair is suppressed (re-ingest is not a dup)
    val suppressed = MinHashLsh.nearDupPairsAgainst(sh(delta), sh(corpus),
        numPerms = 8, bandRows = 2, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(suppressed.isEmpty)
    // includeSameId: the (1, 1) pair with jaccard < 1 IS the drift signal
    val drift = MinHashLsh.nearDupPairsAgainst(sh(delta), sh(corpus),
        numPerms = 8, bandRows = 2, threshold = 0.5, includeSameId = true)
      .select(col("a"), col("b"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
    assert(drift.map(t => (t._1, t._2)).toSet == Set((1L, 1L)))
    assert(drift.head._3 < 1.0 && drift.head._3 > 0.5)
  }

  test("SimHash.nearPairs banded search finds exactly the close-signature pairs") {
    val sigs = Seq(
      (0L, 0x0F0F0F0F0F0F0F0FL),
      (1L, 0x0F0F0F0F0F0F0F0EL), // hamming 1 from 0
      (2L, 0x0F0F0F0F0F0F0FFFL), // hamming 4 from 0
      (3L, -1L)                  // far from all
    ).toDF("doc_id", "simhash")
    val pairs = graft.substrate.SimHash.nearPairs(sigs, maxHamming = 3, bands = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L))) // (0,2) at hamming 4 excluded, 3 far
  }

  test("simhash: near-identical docs land within a small hamming ball, unrelated far") {
    def simhash(df: org.apache.spark.sql.DataFrame) = {
      val tf = df.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
        .withColumn("h", xxhash64(col("tok")))
      tf.select(col("doc_id"), col("w"), col("h"),
          explode(sequence(lit(0), lit(63))).as("b"))
        .withColumn("c", when(expr("(shiftright(h, b) & 1) = 1"), col("w")).otherwise(-col("w")))
        .groupBy("doc_id", "b").agg(sum("c").as("s"))
        .groupBy("doc_id")
        .agg(sum(when(col("s") >= 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
          .otherwise(0L)).as("sig"))
        .as[(Long, Long)].collect().toMap
    }
    val sig = simhash(corpus)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(sig(0L), sig(3L)) == 0)   // exact dup -> identical signature
    assert(hamming(sig(0L), sig(1L)) <= 12)  // near dup -> close
    assert(hamming(sig(0L), sig(2L)) > 12)   // unrelated -> far
  }

  test("portable (md5-bit) simhash32 preserves the same dup geometry") {
    // run the oracled check's pipeline on the constructed corpus by
    // swapping the documents read for a temp view ... simplest: inline the
    // same expressions over the fixture frame
    val tf = corpus.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val sig = tf.select(col("doc_id"), col("w"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("bit", expr(
        "shiftright(instr('0123456789abcdef', substring(h, 1 + (b div 4), 1)) - 1, 3 - (b % 4)) & 1"))
      .withColumn("c", when(col("bit") === 1, col("w")).otherwise(-col("w")))
      .groupBy("doc_id", "b").agg(sum("c").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") >= 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("sig"))
      .as[(Long, Long)].collect().toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(sig.values.forall(s => s >= 0 && s <= 0xFFFFFFFFL)) // 32-bit range
    assert(hamming(sig(0L), sig(3L)) == 0)
    assert(hamming(sig(0L), sig(1L)) <= 8)  // near dup close in 32-bit space
    assert(hamming(sig(0L), sig(2L)) > 8)   // unrelated far
  }

  test("nearDupPairsAgainstIndex with STORED signatures == recomputing them") {
    // the streaming-ingest contract: feeding the precomputed signature
    // artifact must yield exactly the pairs of the recompute-everything
    // path — the index is a cache of the corpus hash, never a different
    // algebra
    import graft.substrate.{MinHashLsh, TextOps}
    val corpus = Seq((0L, base), (2L, different)).toDF("doc_id", "text")
    val delta = Seq((10L, nearDup), (11L, "fresh unseen text with no relation to anything indexed before"))
      .toDF("doc_id", "text")
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
    val stored = MinHashLsh.signatures(sh(corpus), 12)
    val viaIndex = MinHashLsh
      .nearDupPairsAgainstIndex(sh(delta), stored, sh(corpus))
      .as[(Long, Long, Double)].collect().toSet
    val recomputed = MinHashLsh.nearDupPairsAgainst(sh(delta), sh(corpus))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex == recomputed && viaIndex.exists(_._1 == 10L))
  }

  test("dedup_ingest_stream: planted re-ingests surface against the stored index; only streamed docs report") {
    val rows = graft.checks.Checks.byName("dedup_ingest_stream")
      .run(spark, sf)
      .as[(Long, Long, Double)].collect()
    val streamedId = (id: Long) => id >= 2000000L || id % 10 == 7
    // a = the later arrival: always a streamed doc (the index is never
    // checked against itself)
    assert(rows.nonEmpty && rows.forall { case (a, _, j) =>
      streamedId(a) && j >= 0.5 })
    // every planted first-token-dropped re-ingest must pair with its
    // original (the stored-index hit the entry exists to prove)
    val planted = rows.filter(_._1 >= 2000000L).map(p => (p._1, p._2)).toSet
    val expect = (0L until 1000L by 50L)
      .filter(_ < 500).map(id => (id + 2000000L, id)).toSet
    assert(expect.subsetOf(planted), s"missing ${expect -- planted}")
  }
}
