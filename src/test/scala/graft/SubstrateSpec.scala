package graft

import org.apache.spark.sql.functions._

import graft.substrate.{Graph, TextOps, VectorOps}

class SubstrateSpec extends SparkSpec {
  import spark.implicits._

  test("Graph.reachable follows edges transitively and survives cycles") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")).toDF("src", "dst")
    val got = Graph.reachable(edges, Seq("a").toDF("node"))
      .as[String].collect().toSet
    assert(got == Set("a", "b", "c"))
  }

  test("Graph.closure enumerates all strictly-reachable pairs incl. cycle self-loops") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c")).toDF("src", "dst")
    val got = Graph.closure(edges).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("b", "c"), ("a", "a"),
      ("b", "b"), ("a", "c")))
  }

  test("VectorOps.cosine matches hand computation") {
    val df = Seq((Array(1.0, 0.0, 1.0), Array(1.0, 1.0, 0.0))).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12) // dot=1, norms=sqrt2*sqrt2
  }

  test("VectorOps.sqDist matches hand computation") {
    val df = Seq((Array(1.0, 2.0), Array(4.0, 6.0))).toDF("a", "b")
    val got = df.select(VectorOps.sqDist(col("a"), col("b"))).as[Double].head()
    assert(got == 25.0)
  }

  test("mismatched array lengths yield null, not a truncated fold") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 1.0))).toDF("a", "b")
    val dot = df.select(VectorOps.dot(col("a"), col("b"))).collect().head
    assert(dot.isNullAt(0))
    val sq = df.select(VectorOps.sqDist(col("a"), col("b"))).collect().head
    assert(sq.isNullAt(0))
  }

  test("wordTrigrams: under 3 tokens -> empty; exact shingles otherwise") {
    val df = Seq("one two", "a b c d", "  spaced   out   text here ")
      .toDF("text")
    val got = df.select(TextOps.wordTrigrams(col("text"))).as[Seq[String]].collect()
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("a b c", "b c d"))
    assert(got(2) == Seq("spaced out text", "out text here"))
  }

  test("normText collapses whitespace and lowercases") {
    val df = Seq("  Hello   WORLD  ").toDF("text")
    assert(df.select(TextOps.normText(col("text"))).as[String].head() == "hello world")
  }
}
