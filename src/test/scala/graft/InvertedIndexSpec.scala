package graft

import org.apache.spark.sql.functions._

import graft.substrate.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "red fox jumps"),
    (2L, "red dog sleeps"),
    (3L, "red fox sleeps quietly"),
    (4L, "blue whale")).toDF("doc_id", "text")

  test("build: df and sorted distinct postings per token") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
      .select(col("token"), col("df"),
        concat_ws(",", col("postings").cast("array<string>")).as("p"))
      .as[(String, Long, String)].collect()
      .map { case (t, d, p) => t -> ((d, p)) }.toMap
    assert(idx("red") == ((3L, "1,2,3")))
    assert(idx("fox") == ((2L, "1,3")))
    assert(idx("sleeps") == ((2L, "2,3")))
    assert(idx("whale") == ((1L, "4")))
    assert(idx.size == 8) // red fox jumps dog sleeps quietly blue whale
  }

  test("build: within-doc token repeats do not inflate df or postings") {
    val rep = Seq((1L, "a a a b"), (2L, "b b")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(rep, "doc_id", "text")
      .select(col("token"), col("df"), size(col("postings")).as("np"))
      .as[(String, Long, Int)].collect().map {
        case (t, d, n) => t -> ((d, n)) }.toMap
    assert(idx("a") == ((1L, 1)))
    assert(idx("b") == ((2L, 2)))
  }

  test("lookupAll: conjunctive intersection, empty when nothing matches all") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
    def hits(ts: String*) =
      InvertedIndex.lookupAll(idx, ts.toDF("token"))
        .as[Long].collect().toSet
    assert(hits("red", "fox") == Set(1L, 3L))
    assert(hits("red", "fox", "sleeps") == Set(3L))
    assert(hits("red") == Set(1L, 2L, 3L))
    assert(hits("fox", "whale") == Set.empty[Long])
    // duplicate query terms must not double-count an intersection
    assert(hits("red", "red", "fox") == Set(1L, 3L))
  }

  test("rankBm25: tf raises score at equal length; rarer terms outweigh common") {
    // 4 docs, equal length 4; "fox" df=4 (common), "owl" df=1 (rare)
    val c = Seq(
      (1L, "fox fox pad pad"), // tf(fox)=2
      (2L, "fox pad pad pad"), // tf(fox)=1
      (3L, "fox owl pad pad"), // tf(fox)=1 + rare owl
      (4L, "fox pad mat mat")).toDF("doc_id", "text")
    val idx = InvertedIndex.buildWithTf(c, "doc_id", "text")
    val lens = c.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))
    val ranked = InvertedIndex
      .rankBm25(idx, lens, Seq("fox", "owl").toDF("token"), topK = 4)
      .select("rank", "doc_id").as[(Long, Long)].collect().toMap
        .map(_.swap)
    // doc 3 (rare term) wins; doc 1 (tf=2 on the common term) beats the
    // single-occurrence docs 2 and 4; ranks are contiguous 1..4
    assert(ranked(3L) == 1L, s"rare-term doc should rank first: $ranked")
    assert(ranked(1L) == 2L, s"tf=2 doc should rank second: $ranked")
    assert(Set(ranked(2L), ranked(4L)) == Set(3L, 4L))
  }

  test("randomized: lookupAll == brute-force containment filter (3 seeds)") {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    for (seed <- Seq(11, 23, 59)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1L to 60L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val idx = InvertedIndex.build(df, "doc_id", "text")
      val qs = Seq(Seq("ant"), Seq("bee", "cat"), Seq("dog", "elk", "fox"))
      for (q <- qs) {
        val got = InvertedIndex.lookupAll(idx, q.toDF("token"))
          .as[Long].collect().toSet
        val want = corpus.filter { case (_, t) =>
          val toks = t.split(" ").toSet; q.forall(toks.contains)
        }.map(_._1).toSet
        assert(got == want, s"seed $seed terms $q: $got != $want")
      }
    }
  }

  test("lookup answers from the index alone (no corpus re-scan in the plan)") {
    val idx = InvertedIndex.build(corpus, "doc_id", "text")
      .localCheckpoint(true) // sever lineage: the lookup can ONLY see the index
    val got = InvertedIndex.lookupAll(idx, Seq("red", "sleeps").toDF("token"))
      .as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  /** Stopword-heavy corpus (VERDICT r8 #1's pin): "the" appears in EVERY
    * doc, "rare<k>" tokens in one each — the exact vocabulary skew that
    * would put O(corpus) doc_ids into one collect_list cell unsegmented.
    */
  private def skewed(n: Int) = (1L to n.toLong).map { id =>
    (id, s"the filler rare$id")
  }.toDF("doc_id", "text")

  test("segmentation bounds every posting row; reassembly == unsegmented build") {
    val df = skewed(500)
    val seg = InvertedIndex.build(df, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 64)
    val rows = seg.select(col("token"), col("segment"), col("df"),
      size(col("postings")).as("np")).as[(String, Long, Long, Int)].collect()
    // the skew bound: no row exceeds max(dfThreshold, segmentWidth)
    assert(rows.forall(_._4 <= 64), s"oversize row: ${rows.maxBy(_._4)}")
    // "the" (df=500) segments into ceil-coverage of doc_ids 1..500 by 64;
    // rare tokens (df=1 <= 50) keep one segment=-1 row
    val theRows = rows.filter(_._1 == "the")
    assert(theRows.length == 8 && theRows.forall(_._3 == 500L))
    assert(theRows.map(_._2).sorted.toSeq == (0L to 7L),
      s"unexpected segments: ${theRows.map(_._2).sorted.toSeq}")
    assert(rows.filter(_._1.startsWith("rare")).forall(r =>
      r._2 == -1L && r._3 == 1L && r._4 == 1))
    // flattening segments in order reproduces the unsegmented postings
    val flat = seg.groupBy("token")
      .agg(first("df").as("df"),
        flatten(array_sort(collect_list(struct(col("segment"),
          col("postings"))))("postings")).as("postings"))
    val plain = InvertedIndex.build(df, "doc_id", "text")
      .select("token", "df", "postings")
    assert(flat.select("token", "df", "postings")
      .exceptAll(plain).isEmpty && plain.exceptAll(
        flat.select("token", "df", "postings")).isEmpty)
  }

  test("lookupAll and rankBm25 read segmented and unsegmented layouts identically") {
    val df = skewed(300)
    val q = Seq("the", "rare7").toDF("token")
    val plainHits = InvertedIndex
      .lookupAll(InvertedIndex.build(df, "doc_id", "text"), q)
      .as[Long].collect().toSet
    val segHits = InvertedIndex
      .lookupAll(InvertedIndex.build(df, "doc_id", "text",
        dfThreshold = 20, segmentWidth = 32), q)
      .as[Long].collect().toSet
    assert(plainHits == Set(7L) && segHits == plainHits)
    val lens = df.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))
    def ranked(idx: org.apache.spark.sql.DataFrame) = InvertedIndex
      .rankBm25(idx, lens, Seq("the", "rare7").toDF("token"), topK = 5)
      .select("rank", "doc_id", "score")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val a = ranked(InvertedIndex.buildWithTf(df, "doc_id", "text"))
    val b = ranked(InvertedIndex.buildWithTf(df, "doc_id", "text",
      dfThreshold = 20, segmentWidth = 32))
    assert(a == b, s"segmented rank drifted: $a vs $b")
    assert(a.head._2 == 7L) // the rare-term doc wins
  }

  test("lookupPhrase: adjacency in order; strict subset of conjunctive AND") {
    val c = Seq(
      (1L, "machine learning rocks"),        // phrase present
      (2L, "learning about machine design"), // both words, never adjacent
      (3L, "machine learning machine"),      // phrase + extra occurrence
      (4L, "learning machine"),              // adjacent but REVERSED
      (5L, "deep learning")).toDF("doc_id", "text")
    val idx = InvertedIndex.buildPositional(c, "doc_id", "text",
      dfThreshold = 2, segmentWidth = 2) // segmentation active on tiny data
    val terms = Seq(("machine", 0L), ("learning", 1L)).toDF("token", "offset")
    val phrase = InvertedIndex.lookupPhrase(idx, terms)
      .as[Long].collect().toSet
    val conj = InvertedIndex.lookupAll(
      InvertedIndex.build(c, "doc_id", "text"),
      Seq("machine", "learning").toDF("token")).as[Long].collect().toSet
    assert(phrase == Set(1L, 3L), s"phrase hits: $phrase")
    assert(conj == Set(1L, 2L, 3L, 4L), s"AND hits: $conj")
    assert(phrase.subsetOf(conj) && phrase != conj,
      "phrase must strictly refine conjunctive AND on this corpus")
    // duplicated-token phrase: "machine machine" only matches repeats
    val dup = InvertedIndex.lookupPhrase(idx,
      Seq(("machine", 0L), ("machine", 1L)).toDF("token", "offset"))
      .as[Long].collect().toSet
    assert(dup == Set.empty[Long])
    val dup2 = InvertedIndex.lookupPhrase(
      InvertedIndex.buildPositional(
        Seq((9L, "go go gadget")).toDF("doc_id", "text"), "doc_id", "text"),
      Seq(("go", 0L), ("go", 1L)).toDF("token", "offset"))
      .as[Long].collect().toSet
    assert(dup2 == Set(9L))
    // 3-slot phrase: all three words in order, consecutively — doc 3 has
    // them in order but split, doc 1 exact
    val tri = InvertedIndex.lookupPhrase(idx,
      Seq(("machine", 0L), ("learning", 1L), ("rocks", 2L))
        .toDF("token", "offset")).as[Long].collect().toSet
    assert(tri == Set(1L), s"trigram hits: $tri")
  }

  test("lookupNear: exists-a-window semantics, exact slop boundary, order-free") {
    val c = Seq(
      (1L, "alpha beta gamma"),             // span 2
      (2L, "alpha x beta y gamma"),         // span 4
      (3L, "gamma beta alpha"),             // reversed, span 2
      (4L, "alpha beta zeta"),              // gamma missing
      (5L, "alpha x x x beta x x x gamma")) // span 8
      .toDF("doc_id", "text")
    val idx = InvertedIndex.buildPositional(c, "doc_id", "text",
      dfThreshold = 2, segmentWidth = 2) // segmentation active
    def near(slop: Int) = InvertedIndex.lookupNear(idx,
      Seq("alpha", "beta", "gamma").toDF("token"), slop)
      .as[Long].collect().toSet
    assert(near(2) == Set(1L, 3L), s"slop 2: ${near(2)}")
    assert(near(3) == Set(1L, 3L), "span-4 doc must NOT match slop 3")
    assert(near(4) == Set(1L, 2L, 3L), "span-4 doc matches at exactly slop 4")
    assert(near(8) == Set(1L, 2L, 3L, 5L))
    // proximity sits between exact phrase and conjunctive AND
    val conj = InvertedIndex.lookupAll(
      InvertedIndex.build(c, "doc_id", "text"),
      Seq("alpha", "beta", "gamma").toDF("token")).as[Long].collect().toSet
    assert(conj == Set(1L, 2L, 3L, 5L) && near(2).subsetOf(conj))
  }

  test("mergeDelta == full rebuild, including a df-threshold crossing") {
    // base: "tide" in 40 docs (below threshold 50 → single row);
    // delta adds 20 more "tide" docs → df=60 crosses, must re-segment
    val base = (1L to 40L).map(id => (id, s"tide unique$id"))
      .toDF("doc_id", "text")
    val delta = (41L to 60L).map(id => (id, s"tide fresh$id"))
      .toDF("doc_id", "text")
    val stored = InvertedIndex.build(base, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val merged = InvertedIndex.mergeDelta(stored, delta, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val full = InvertedIndex.build(base.unionByName(delta), "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("token"), col("segment"), col("df"),
        concat_ws(",", col("postings").cast("array<string>")).as("p"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(canon(merged) == canon(full))
    // the crossing is real: "tide" is single-row in the stored index and
    // multi-segment after the merge
    assert(stored.filter(col("token") === "tide").count() == 1)
    assert(merged.filter(col("token") === "tide").count() > 1)
    // untouched tokens' rows pass through by anti-join, not rebuild:
    // delta vocabulary does not include unique<k>, so those rows survive
    assert(canon(merged.filter(col("token").startsWith("unique"))) ==
      canon(stored.filter(col("token").startsWith("unique"))))
  }

  test("mergeDeltaPositional == full positional rebuild; phrase serving intact") {
    // base: "ebb tide" docs (tide df=40, below threshold 50); delta adds
    // 20 "tide tide rises" docs — df crosses, tf=2, fresh positions
    val base = (1L to 40L).map(id => (id, s"ebb tide unique$id"))
      .toDF("doc_id", "text")
    val delta = (41L to 60L).map(id => (id, s"tide tide rises fresh$id"))
      .toDF("doc_id", "text")
    val stored = InvertedIndex.buildPositional(base, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val merged = InvertedIndex.mergeDeltaPositional(stored, delta,
      "doc_id", "text", dfThreshold = 50, segmentWidth = 16)
    val full = InvertedIndex.buildPositional(base.unionByName(delta),
      "doc_id", "text", dfThreshold = 50, segmentWidth = 16)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("token"), col("segment"), col("df"),
        expr("array_join(transform(postings, p -> concat(cast(p.doc_id as string), ':', " +
          "cast(p.tf as string), ':', array_join(cast(p.positions as array<string>), '|'))), ',')").as("p"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(canon(merged) == canon(full))
    // tf and positions survive the merge: delta docs carry tide at 0|1
    assert(canon(merged).exists { case (t, _, d, p) =>
      t == "tide" && d == 60L && p.contains(":2:0|1") })
    // the merged index still serves phrase retrieval: "ebb tide" matches
    // exactly the base docs, "tide rises" exactly the delta docs
    def phrase(w1: String, w2: String) = InvertedIndex.lookupPhrase(merged,
      Seq((w1, 0L), (w2, 1L)).toDF("token", "offset"))
      .as[Long].collect().toSet
    assert(phrase("ebb", "tide") == (1L to 40L).toSet)
    assert(phrase("tide", "rises") == (41L to 60L).toSet)
  }
  test("deleteDocs == rebuild on remaining, including the DOWNWARD threshold crossing") {
    // full: "tide" in 60 docs (df=60 > threshold 50 → segmented);
    // delete 20 → df=40 re-coalesces to the single -1 row; sole-occupant
    // tokens (fresh<k>) vanish; untouched tokens pass through unchanged
    val docs = ((1L to 40L).map(id => (id, s"tide unique$id")) ++
      (41L to 60L).map(id => (id, s"tide fresh$id")))
      .toDF("doc_id", "text")
    val deleted = docs.filter(col("doc_id") > 40L)
    val stored = InvertedIndex.build(docs, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val after = InvertedIndex.deleteDocs(stored, deleted, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val rebuilt = InvertedIndex.build(docs.filter(col("doc_id") <= 40L),
      "doc_id", "text", dfThreshold = 50, segmentWidth = 16)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("token"), col("segment"), col("df"),
        concat_ws(",", col("postings").cast("array<string>")).as("p"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(canon(after) == canon(rebuilt))
    assert(stored.filter(col("token") === "tide").count() > 1)
    assert(after.filter(col("token") === "tide").count() == 1,
      "df falling back under the threshold must re-coalesce the segments")
    assert(after.filter(col("token").startsWith("fresh")).count() == 0,
      "a token whose every posting is deleted must vanish")
    assert(canon(after.filter(col("token").startsWith("unique"))) ==
      canon(stored.filter(col("token").startsWith("unique"))))
    // the forget proof: no deleted doc_id survives anywhere
    assert(after.select(explode(col("postings")).as("doc_id"))
      .filter(col("doc_id") > 40L).count() == 0)
  }

  test("deleteDocsPositional == positional rebuild on remaining; phrase serving forgets") {
    val docs = ((1L to 40L).map(id => (id, s"ebb tide unique$id")) ++
      (41L to 60L).map(id => (id, s"tide tide rises fresh$id")))
      .toDF("doc_id", "text")
    val deleted = docs.filter(col("doc_id") > 40L)
    val stored = InvertedIndex.buildPositional(docs, "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    val after = InvertedIndex.deleteDocsPositional(stored, deleted,
      "doc_id", "text", dfThreshold = 50, segmentWidth = 16)
    val rebuilt = InvertedIndex.buildPositional(
      docs.filter(col("doc_id") <= 40L), "doc_id", "text",
      dfThreshold = 50, segmentWidth = 16)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("token"), col("segment"), col("df"),
        expr("array_join(transform(postings, p -> concat(cast(p.doc_id as string), ':', " +
          "cast(p.tf as string), ':', array_join(cast(p.positions as array<string>), '|'))), ',')").as("p"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(canon(after) == canon(rebuilt))
    def phrase(w1: String, w2: String) = InvertedIndex.lookupPhrase(after,
      Seq((w1, 0L), (w2, 1L)).toDF("token", "offset"))
      .as[Long].collect().toSet
    assert(phrase("ebb", "tide") == (1L to 40L).toSet)
    assert(phrase("tide", "rises") == Set.empty[Long],
      "phrase hits over deleted docs must be forgotten")
  }

  test("multi-batch mergeDelta fold == single rebuild (5 deterministic batches)") {
    // the streaming-ingest composition (inverted_index_stream folds
    // batch-wise): starting from an EMPTY-base build, fold 5 disjoint
    // hash-assigned batches of the corpus in sequence and land exactly
    // on the one-shot build — associativity of the merge over any batch
    // decomposition, thresholds crossing or not
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    def canon(idx: org.apache.spark.sql.DataFrame) =
      idx.select(col("token"), col("segment"), col("df"),
          concat_ws(",", col("postings").cast("array<string>")).as("p"))
        .collect().map(_.toString).sorted.toSeq
    val batches = (0 until 5).map(b =>
      d.filter((col("doc_id") * 2654435761L + 40503L) % 5 === b))
    assert(batches.forall(_.count() > 0))
    var idx = InvertedIndex.build(batches.head, "doc_id", "text",
      dfThreshold = 20, segmentWidth = 50).localCheckpoint(true)
    batches.tail.foreach { b =>
      idx = InvertedIndex.mergeDelta(idx, b, "doc_id", "text",
        dfThreshold = 20, segmentWidth = 50).localCheckpoint(true)
    }
    val full = InvertedIndex.build(d, "doc_id", "text",
      dfThreshold = 20, segmentWidth = 50)
    assert(canon(idx) == canon(full))
  }
}
