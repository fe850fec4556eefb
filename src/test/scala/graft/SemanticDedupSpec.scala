package graft

import org.apache.spark.sql.functions._

import graft.checks.Checks
import graft.substrate.{IvfIndex, VectorOps}

/** SemDeDup-style cluster-scoped dedup (`dedup_semantic`): pins the drop
  * rule (only planted copies drop, keeper = the copy's own original) and
  * cross-checks the cell-boundary semantics against an independent
  * recomputation — a copy is dropped iff it lands in the same IVF cell as
  * its original (background cosine ≤ 0.6 can never cross the 0.95 cut, so
  * co-cell membership is the whole decision).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_semantic drops exactly the planted copies co-celled with their original") {
    val rows = Checks.byName("dedup_semantic").run(spark, sf).collect()
    assert(rows.nonEmpty, "planted corpus must yield semantic duplicates")
    rows.foreach { r =>
      val dropped = r.getLong(0)
      val keeper = r.getLong(1)
      assert(dropped >= 1000000L, s"original $dropped must never drop")
      assert(keeper == dropped - 1000000L,
        s"keeper of $dropped must be its own original, got $keeper")
    }

    // Independent recomputation of the cell-boundary rule.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
    val aug = e.unionAll(e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x + lit(0.01)).as("v")))
    val cells = IvfIndex.assign(aug, centroidMod = 23)
      .select(col("vec_id"), col("cell")).cache()
    val coCelled = cells.filter(col("vec_id") >= 1000000L).as("c")
      .join(cells.as("o"),
        col("c.vec_id") - 1000000L === col("o.vec_id") &&
          col("c.cell") === col("o.cell"))
      .select(col("c.vec_id")).as[Long].collect().toSet

    val droppedSet = rows.map(_.getLong(0)).toSet
    assert(droppedSet == coCelled,
      s"dropped set must equal co-celled copies: ${droppedSet.size} vs ${coCelled.size}")

    // Cell-boundary recall: the shifted copy usually shares its original's
    // cell; boundary losses are SemDeDup's documented approximation.
    val nPlanted = e.filter(col("vec_id") % 50 === 0).count()
    val recall = droppedSet.size.toDouble / nPlanted
    info(s"semantic-dedup cell recall = $recall (${droppedSet.size} of $nPlanted)")
    assert(recall >= 0.5, s"cell recall $recall collapsed — assignment drifted")
  }
}
