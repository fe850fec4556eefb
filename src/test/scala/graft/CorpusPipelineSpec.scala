package graft

import org.apache.spark.sql.functions._

import graft.checks.TextTier

/** Independent reconciliation of the composed corpus_prep_pipeline funnel
  * (VERDICT r7 #3): each distributed stage is re-derived with a local
  * reference implementation (union-find, gram sets, greedy packer) on the
  * collected intermediate frames, and the plant fates are asserted
  * end-to-end. The cross-engine hash equivalence of the same funnel is the
  * registry row's DuckDB oracle; this spec proves the stages agree with
  * first-principles recomputation INSIDE the engine.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val st = TextTier.corpusPrepStages(spark, sf)
  private lazy val funnel = st.funnel.collect().head
  private def f(c: String): Long = funnel.getAs[Long](c)

  test("SpanDupPlant carriers (doc_id % 17 == 0) are train-split at every SF") {
    // the plant's design precondition (see SpanDupPlant scaladoc): the
    // Knuth split hash must put every multiple of 17 below 80 for all
    // driver corpus sizes, or the decontamination gate would eat the
    // carriers before span removal can witness them
    def mixMod(d: Long): Long = (d * 2654435761L + 40503L) % 2147483647L % 100
    val badSplit = (0L until 5000L by 17L).filterNot(d => mixMod(d) < 80)
    assert(badSplit.isEmpty, s"multiples of 17 outside train: $badSplit")
    // while ContamPlant carriers on the %4 quarter corpus (so multiples
    // of 52) must reach BOTH train and test at every SF size
    for (n <- Seq(500L, 5000L)) {
      val residues = (0L until n by 52L).map(mixMod)
      assert(residues.exists(_ < 80) && residues.exists(_ >= 90),
        s"%52 carriers miss a split at corpus size $n")
    }
  }

  test("funnel is monotone and every stage is non-vacuous at sf0.001") {
    assert(f("docs_in") > f("after_gates"))
    assert(f("after_gates") >= f("after_neardup"))
    assert(f("after_neardup") >= f("train_candidates"))
    assert(f("train_candidates") > f("after_decontam"), "gate vacuous")
    assert(f("after_gates") > f("after_neardup"), "near-dup stage vacuous")
    assert(f("span_tokens_removed") > 0, "span removal vacuous")
    assert(f("after_decontam") >= f("after_span"))
    assert(f("n_packs") > 0 && f("packed_tokens") > 0)
  }

  test("planted near-dup copies all fall at stage 4; originals survive it") {
    val augIds = st.aug.select("doc_id").as[Long].collect().toSet
    val copies = augIds.filter(_ >= 1000000L)
    assert(copies.nonEmpty)
    val kept4Ids = st.kept4.select("doc_id").as[Long].collect().toSet
    assert(copies.intersect(kept4Ids).isEmpty,
      s"planted copies survived near-dup retention: ${copies.intersect(kept4Ids)}")
    // min-id retention: a copy's ORIGINAL survives stage 4 whenever it
    // survived the gates (kept3)
    val kept3Ids = st.kept3.select("doc_id").as[Long].collect().toSet
    val originalsInPlay = copies.map(_ - 1000000L).filter(kept3Ids)
    assert(originalsInPlay.nonEmpty && originalsInPlay.subsetOf(kept4Ids))
  }

  test("near-dup retention count reconciles with a local union-find") {
    val edges = st.pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nonReps = parent.keys.count(n => find(n) != n)
    assert(f("after_gates") - f("after_neardup") == nonReps)
  }

  test("decontamination gate: survivors share no 13-gram with the test split") {
    def grams(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < 13) Set.empty
      else t.sliding(13).map(_.mkString(" ")).toSet
    }
    def mixMod(d: Long): Long = (d * 2654435761L + 40503L) % 2147483647L % 100
    val testGrams = st.aug.select("doc_id", "text").as[(Long, String)].collect()
      .filter { case (d, _) => mixMod(d) >= 90 }
      .flatMap { case (_, t) => grams(t) }.toSet
    val train = st.trainDocs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val kept5Ids = st.kept5.select("doc_id").as[Long].collect().toSet
    val (surv, dropped) = train.partition { case (d, _) => kept5Ids(d) }
    assert(surv.values.forall(t => grams(t).intersect(testGrams).isEmpty),
      "a surviving train doc shares a 13-gram with the test split")
    assert(dropped.values.forall(t => grams(t).intersect(testGrams).nonEmpty),
      "a dropped train doc shares NO 13-gram with the test split")
    assert(dropped.nonEmpty) // the ContamPlant made the gate bite
  }

  test("span removal strips every SpanDupPlant token from the cleaned text") {
    val cleanTexts = st.cleaned.select("text_clean").as[String].collect()
    assert(cleanTexts.nonEmpty)
    assert(!cleanTexts.exists(_.contains("quokka")),
      "a SpanDupPlant token survived span removal")
    // and ≥ 2 carriers reached stage 6 (else the plant proved nothing)
    val kept5Ids = st.kept5.select("doc_id").as[Long].collect().toSet
    assert(kept5Ids.count(d => d < 1000000L && d % 17 == 0) >= 2)
  }

  test("packing reconciles with a local greedy 512-token packer") {
    val rows = st.packIn.select("source", "doc_id", "n_toks")
      .as[(String, Long, Long)].collect()
    val expectedPacks = rows.groupBy(_._1).map { case (_, docs) =>
      var cum = 0L
      val packIds = docs.sortBy(_._2).map { case (_, _, n) =>
        val id = cum / 512; cum += n; id
      }
      packIds.distinct.size
    }.sum
    assert(f("n_packs") == expectedPacks)
    assert(f("packed_tokens") == rows.map(_._3).sum)
    assert(f("after_span") == rows.length)
  }
}
