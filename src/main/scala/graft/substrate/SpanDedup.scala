package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring span REMOVAL — the dedup ACTION the diagnostic views
  * (`dup_span_stats`, `ngram_contamination`) stop short of: rewrite each
  * document by deleting every token covered by a word n-gram that also
  * appears in at least one OTHER document (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499 — the word-shingle form of their suffix-array
  * exact-substring dedup; n = 13 is the classic span). Novel text is
  * untouched: a gram unique to one document covers nothing.
  *
  * Scale shape (serving the training-corpus preparation the reference
  * motivates at `factors/2-consumable.md:25` — training consumes the
  * corpus repeatedly, so cleaning must be a linear batch pass):
  * position-tagged grams are one native-expression pass + posexplode
  * (functions.WordShinglesPos); duplicated grams are one gram-keyed
  * groupBy (the same shuffle the MinHash signature pass does); coverage
  * maps each duplicated gram occurrence to its n positions (constant
  * fan-out n); the rebuild is one doc-keyed agg. Linear in corpus size,
  * never all-pairs — the gram equi-join is the only place documents meet.
  */
object SpanDedup {

  /** Classic decontamination/dedup span length (13 consecutive words). */
  val DefaultSpanTokens = 13

  /** Rewrite `docs(idCol, textCol)` by removing cross-document duplicated
    * spans. Output: (idCol, n_tokens, n_removed, text_clean) — kept tokens
    * re-joined by single spaces in original order; a fully-duplicated
    * document comes back as the empty string.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = DefaultSpanTokens): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    val id = col(idCol)
    val arr = docs.select(id, TextOps.tokens(col(textCol)).as("__tk"))
    // (id, start, gram) — every n-gram, position-tagged (start is 0-based);
    // the native expression runs over the already-tokenized array
    val grams = arr.select(id,
      posexplode(GraftColumn.of(graft.functions.WordShinglesPos(
        GraftColumn.expressionOf(col("__tk")), n))).as(Seq("start", "gram")))
    // grams seen in ≥ 2 distinct documents; within-doc repeats alone are
    // kept (self-repetition is repetition_detect's signal, not dedup's)
    val dup = grams.groupBy("gram")
      .agg(countDistinct(id).as("__nd"))
      .filter(col("__nd") > 1).select("gram")
    // every token position covered by some duplicated gram occurrence
    val covered = grams.join(dup, Seq("gram"), "left_semi")
      .select(id, explode(sequence(col("start"),
        col("start") + (n - 1))).as("pos"))
      .distinct()
    val toks = arr.select(id, posexplode(col("__tk")).as(Seq("pos", "tok")))
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("__clean"))
    toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(id, col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .cast("long").as("n_removed"),
        coalesce(col("__clean"), lit("")).as("text_clean"))
  }
}
