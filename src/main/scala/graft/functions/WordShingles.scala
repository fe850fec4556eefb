package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array — native replacement
  * for `array_distinct(transform(sequence(...), i => concat_ws(...)))`,
  * which evaluates three `element_at` + a varargs concat through the
  * interpreted HOF path per shingle (measured ~11 s of the near-dup sweep
  * at sf0.1; this loop makes it marginal).
  *
  * Semantics match the HOF formulation exactly: first-occurrence order,
  * single-space joins, empty array under n tokens. Operates directly on
  * UTF8String — no JVM String round-trip.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray().asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_word_shingles"
}

/** ALL word n-grams in POSITION order (no dedup) — the span-level sibling
  * of [[WordShingles]]: element i is the n-gram starting at token i, so
  * `posexplode` over the result yields (start, gram) directly and a span
  * operator can map duplicated grams back to the token positions they
  * cover (substrate.SpanDedup). Empty array under n tokens. Same native
  * UTF8String loop as WordShingles — the HOF formulation
  * (`transform(sequence(...), i => concat_ws(' ', slice(...)))`) slices a
  * fresh array per gram through the interpreted path.
  */
case class WordShinglesPos(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_word_shingles_pos"
}
