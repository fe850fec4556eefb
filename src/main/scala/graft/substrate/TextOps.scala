package graft.substrate

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._

import graft.functions.WordShingles

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
    * Native expression (functions.WordShingles) — the HOF formulation
    * (`array_distinct(transform(sequence(...), concat_ws(element_at...)))`)
    * is interpreted per shingle and dominated the dedup sweep.
    */
  def wordTrigrams(text: Column): Column =
    GraftColumn.of(WordShingles(GraftColumn.expressionOf(tokens(text)), 3))

  /** Distinct word n-gram shingles for arbitrary n (empty array for docs
    * under n tokens) — wordTrigrams generalized; n = 13 is the classic
    * benchmark-decontamination span.
    */
  def wordShingles(text: Column, n: Int): Column =
    GraftColumn.of(WordShingles(GraftColumn.expressionOf(tokens(text)), n))

  /** ALL word n-grams in position order (element i = gram starting at
    * token i; no dedup) — the span-level companion of [[wordShingles]],
    * for operators that must map a duplicated gram back to the token
    * positions it covers ([[SpanDedup]]).
    */
  def wordShinglesPos(text: Column, n: Int): Column =
    GraftColumn.of(
      graft.functions.WordShinglesPos(GraftColumn.expressionOf(tokens(text)), n))

  /** BPE-ish subtoken count: letter runs, digit runs, single non-space
    * symbols.
    */
  val SubtokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubtokenPattern), lit(0)))
}
