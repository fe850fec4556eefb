package graft.substrate

import graft.SparkSpec

/** The distributed iterate path must agree with the driver-local BFS fast
  * path (the public API picks by size; small fixtures exercise the local
  * path, so the distributed one is pinned here directly).
  */
class GraphDistributedSpec extends SparkSpec {
  import spark.implicits._

  test("distributed reachable matches local BFS on a cyclic graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val dist = Graph.reachableDistributed(edges, seeds, 64)
      .as[String].collect().toSet
    val local = Graph.reachable(edges, seeds).as[String].collect().toSet
    assert(dist == local && dist == Set("a", "b", "c"))
  }

  test("distributed closure matches local BFS closure") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c")).toDF("src", "dst")
    val dist = Graph.closureDistributed(edges, 64)
      .as[(String, String)].collect().toSet
    val local = Graph.closure(edges).as[(String, String)].collect().toSet
    assert(dist == local)
  }

  // chain (4-2-6-8 via unordered edges), triangle sharing nothing, and a
  // disjoint pair: labels must be the component minimum everywhere
  private val componentEdges = Seq(
    (6L, 2L), (2L, 4L), (6L, 8L),   // chain component, min 2
    (11L, 13L), (13L, 12L), (12L, 11L), // triangle (cycle), min 11
    (30L, 20L))                     // pair, min 20

  test("components: union-find labels every node with its component min") {
    val out = Graph.components(componentEdges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 2L, 4L -> 2L, 6L -> 2L, 8L -> 2L,
      11L -> 11L, 12L -> 11L, 13L -> 11L, 20L -> 20L, 30L -> 20L))
  }

  test("distributed label propagation matches the union-find fast path") {
    val e = componentEdges.toDF("src", "dst")
      .select($"src".cast("long"), $"dst".cast("long"))
    val dist = Graph.componentsDistributed(e, 32)
      .as[(Long, Long)].collect().toSet
    val local = Graph.components(componentEdges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(dist == local)
  }
}
