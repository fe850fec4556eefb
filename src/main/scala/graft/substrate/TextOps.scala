package graft.substrate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis tier — all built from
  * codegen'd Catalyst expressions so the whole pipeline stays in
  * whole-stage codegen. Every definition here has a byte-identical DuckDB
  * mirror in the oracle SQL (same regexes; DuckDB needs the explicit 'g'
  * flag where Spark's regexp_replace is always global).
  */
object TextOps {

  /** Whitespace tokenization of trimmed text (no empty tokens). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace-normalized lowercase text (exact-dedup key). */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Distinct word-trigram shingles; empty array for docs under 3 tokens.
    * `sequence(0, size-3)` must be guarded: Spark's sequence DESCENDS when
    * stop < start (sequence(0,-1) = [0,-1]).
    */
  def wordTrigrams(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** BPE-ish subtoken count: letter runs, digit runs, single non-space
    * symbols.
    */
  val SubtokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubtokenPattern), lit(0)))
}
