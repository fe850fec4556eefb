package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph reachability over an edge DataFrame — the relational
  * backing for the lineage checks (reference `factors/requirements.yaml:
  * 132-134` lineage completeness, `156-158` impact analysis).
  *
  * Semi-naive iteration: each round joins only the NEW frontier against the
  * edge list, accumulating a visited set that also guards against cycles
  * (the reference's lineage model doesn't forbid them). `localCheckpoint`
  * truncates the growing plan lineage each round — without it the Catalyst
  * plan doubles per iteration.
  *
  * Scale note: lineage/dependency graphs are metadata (SURVEY.md §4) — node
  * counts in the thousands, not billions, so the per-round `count()` action
  * is cheap. For data-scale graphs this would move to GraphFrames-style
  * Pregel; the assessment engine never needs that.
  */
object Graph {

  /** All nodes reachable from `seeds` by following `edges` (src → dst),
    * INCLUDING the seeds. `edges` must have columns (src, dst); `seeds` one
    * column (node).
    */
  def reachable(edges: DataFrame, seeds: DataFrame, maxIters: Int = 64): DataFrame = {
    var reached = seeds.toDF("node").distinct().localCheckpoint()
    var frontier = reached
    var iter = 0
    while (iter < maxIters && frontier.limit(1).count() > 0) {
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select(edges("dst").as("node")).distinct()
      frontier = next.join(reached, Seq("node"), "left_anti").localCheckpoint()
      reached = reached.unionAll(frontier).localCheckpoint()
      iter += 1
    }
    reached
  }

  /** Full transitive closure as (node, reachable) pairs — every node of the
    * graph paired with every node strictly reachable from it. Used by the
    * `lineage_impact` operator (downstream impact enumeration).
    */
  def closure(edges: DataFrame, maxIters: Int = 64): DataFrame = {
    val e = edges.select(col("src").as("node"), col("dst").as("reachable")).distinct()
    var acc = e.localCheckpoint()
    var frontier = e
    var iter = 0
    while (iter < maxIters && frontier.limit(1).count() > 0) {
      val next = frontier.join(e.toDF("mid", "nxt"),
          frontier("reachable") === col("mid"))
        .select(frontier("node"), col("nxt").as("reachable")).distinct()
      frontier = next.join(acc, Seq("node", "reachable"), "left_anti").localCheckpoint()
      acc = acc.unionAll(frontier).localCheckpoint()
      iter += 1
    }
    acc
  }
}
