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

  test("pointer doubling: a 200-node chain converges within 10 rounds") {
    // plain min-label propagation needs O(diameter)=199 rounds here; the
    // doubling shortcut needs ~log2(199)+2. 10 rounds passing proves the
    // shortcut is active, not just a bigger budget.
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.componentsDistributed(chain, 10)
      .as[(Long, Long)].collect()
    assert(out.length == 200 && out.forall(_._2 == 1L))
  }

  test("unconverged component propagation raises instead of returning wrong labels") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Graph.componentsDistributed(chain, 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("truncated reachable raises instead of returning a partial set") {
    val chain = (1L until 20L).map(i => (i.toString, (i + 1).toString))
      .toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Graph.reachableDistributed(chain, Seq("1").toDF("node"), 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
