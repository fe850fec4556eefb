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
}
