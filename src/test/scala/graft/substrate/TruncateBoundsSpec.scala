package graft.substrate

import org.scalatest.funsuite.AnyFunSuite

/** The Iceberg-style string-bound truncation algebra (r15 — VERDICT r14
  * what's-missing #4): a truncated MIN is a prefix (sorts ≤ the full
  * string), a truncated MAX sorts strictly ABOVE every string sharing
  * the truncated prefix, multi-byte code points are never split, and a
  * saturated max degrades to unknown rather than a wrong bound. Pure
  * driver arithmetic — no Spark session needed.
  */
class TruncateBoundsSpec extends AnyFunSuite {

  private def lt(a: String, b: String) = MetaIo.utf8Lt(a, b)

  test("truncateMin is a prefix and sorts <= the original") {
    val s = "src3/eng/" + ("x" * 100)
    val t = MetaIo.truncateMin(s, 16)
    assert(t.length == 16 && s.startsWith(t))
    assert(lt(t, s))
    // short strings pass through untouched
    assert(MetaIo.truncateMin("abc", 16) == "abc")
  }

  test("truncateMax sorts strictly above every string sharing the " +
      "truncated prefix — a matching file can never be exonerated") {
    val prefix = "src3/eng/0000001"          // 16 chars
    val full = prefix + ("x" * 100)
    val hi = MetaIo.truncateMax(full, 16).get
    assert(hi.length == 16)
    // any string with this prefix — including ones longer than the
    // original max — sorts strictly below the incremented bound
    Seq(full, prefix, prefix + ("￿" * 10), full + "zzz").foreach {
      s => assert(lt(s, hi), s"$s must sort below the truncated max")
    }
    // and the bound is tight: it differs from the prefix only in the
    // last code point, bumped by one
    assert(hi.take(15) == prefix.take(15) &&
      hi.last == (prefix.last + 1).toChar)
  }

  test("the increment walks back past saturated positions and skips " +
      "the surrogate gap; an all-saturated max is unknown") {
    // last position at MAX_CODE_POINT: the bump lands one position back
    val sat = new String(Character.toChars(Character.MAX_CODE_POINT))
    val s1 = "ab" + sat + "tail-beyond"
    val h1 = MetaIo.truncateMax(s1, 3).get
    assert(h1 == "ac")
    assert(lt(s1, h1))
    // U+D7FF increments to U+E000, never into the surrogate range
    val s2 = "a\uD7FF" + ("x" * 80)
    val h2 = MetaIo.truncateMax(s2, 2).get
    assert(h2 == "a\uE000")
    assert(lt(s2, h2))
    // every position saturated: no valid upper bound exists
    assert(MetaIo.truncateMax(sat * 2 + "tail", 2).isEmpty)
    // short strings pass through untouched
    assert(MetaIo.truncateMax("abc", 16).contains("abc"))
  }

  test("multi-byte code points are counted as units, never split") {
    val s = ("€" * 20) + ("x" * 80) // euro sign: 3 UTF-8 bytes
    val t = MetaIo.truncateMin(s, 16)
    assert(t == "€" * 16)
    val h = MetaIo.truncateMax(s, 16).get
    assert(h == ("€" * 15) + "₭" && lt(s, h))
  }
}
