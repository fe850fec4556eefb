package graft

import org.apache.spark.sql.functions._

/** ngram_contamination (13-gram benchmark-decontamination diagnostic)
  * against an independent driver-side recomputation: collect the sf0.001
  * corpus (57 test docs) and rebuild splits, 13-gram sets, and the
  * shared-span counts in plain Scala collections.
  */
class NgramContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side recomputation on sf0.001") {
    val out = graft.checks.PipelineTier.ngramContamination.run(spark, sf)
      .as[(Long, Long)].collect().toMap

    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def split(id: Long): String = {
      val b = ((id * 2654435761L + 40503L) % 2147483647L) % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    def grams(t: String): Set[String] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 13) Set.empty
      else ts.sliding(13).map(_.mkString(" ")).toSet
    }
    val trainGrams = texts.filter(d => split(d._1) == "train")
      .flatMap(d => grams(d._2)).toSet
    val expected = texts.filter(d => split(d._1) == "test")
      .map(d => d._1 -> grams(d._2).count(trainGrams.contains).toLong)
      .filter(_._2 > 0).toMap

    assert(out == expected,
      s"mismatch: spark=$out expected=$expected")
    assert(expected.nonEmpty, "fixture must exercise a non-empty overlap")
  }

  test("dedup_span_removal: planted spans vanish, novel text survives") {
    val rows = graft.checks.TextTier.dedupSpanRemoval.run(spark, sf)
      .select("doc_id", "n_tokens", "n_removed", "text_clean")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val plantWords = ("zephyr quartz fjord glyph nymph vex jukebox " +
      "sphinx waltz quiver blitz gnome plume torch ember").split(" ").toSet

    // driver-side reference over the SAME planted corpus: duplicated
    // 13-gram positions → expected kept text per doc
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val planted = texts.map { case (id, t) =>
      id -> (if (id % 10 == 0)
        t + " zephyr quartz fjord glyph nymph vex jukebox sphinx waltz " +
          "quiver blitz gnome plume torch ember"
      else t)
    }
    val toks = planted.map { case (id, t) => id -> t.trim.split("\\s+") }
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, ts) =>
      if (ts.length >= 13) ts.sliding(13).map(_.mkString(" "))
        .foreach(g => gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id)
    }
    val dup = gramDocs.filter(_._2.size > 1).keySet
    val expected = toks.map { case (id, ts) =>
      val covered = Array.fill(ts.length)(false)
      if (ts.length >= 13)
        ts.sliding(13).zipWithIndex.foreach { case (w, i) =>
          if (dup.contains(w.mkString(" ")))
            (i until i + 13).foreach(covered(_) = true)
        }
      val keptToks = ts.indices.filterNot(covered).map(ts)
      id -> (ts.length.toLong, (ts.length - keptToks.length).toLong,
        keptToks.mkString(" "))
    }.toMap

    rows.foreach { case (id, nTok, nRem, clean) =>
      val (eTok, eRem, eClean) = expected(id)
      assert(nTok == eTok && nRem == eRem && clean == eClean,
        s"doc $id: got ($nTok,$nRem,'$clean') want ($eTok,$eRem,'$eClean')")
      // planted spans vanish: no planted word survives in any cleaned doc
      // (they are out-of-vocabulary, so any survivor must be a plant)
      val survivors = clean.split("\\s+").filter(plantWords.contains)
      assert(survivors.isEmpty,
        s"doc $id kept planted words: ${survivors.mkString(",")}")
    }
    // removal really happened on planted docs…
    assert(rows.filter(_._1 % 10 == 0).forall(_._3 >= 15),
      "every planted doc must lose at least its 15-token span")
    // …and novel text survives: some docs keep tokens
    assert(rows.exists(r => r._4.nonEmpty),
      "corpus must not be wiped — novel text survives")
  }
}
