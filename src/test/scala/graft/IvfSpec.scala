package graft

import org.apache.spark.sql.functions._

import graft.substrate.{IvfIndex, VectorOps}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
  }

  test("every vector lands in exactly one cell; cells are centroid ids") {
    val e = embeddings
    val assigned = IvfIndex.assign(e, centroidMod = 23).cache()
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
    val cells = assigned.select("cell").distinct().as[Long].collect().toSet
    assert(cells.forall(_ % 23 == 0))
  }

  test("IVF top-k recall against exact search is meaningfully above chance") {
    val e = embeddings.cache()
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val approx = IvfIndex.topK(e, q, centroidMod = 23, k = 10, nProbe = 4)
      .select("qid", "cid")
    // exact euclidean ground truth
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val d = q.crossJoin(e).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          VectorOps.sqDist(col("qv"), col("v")).as("d2"))
      val w = Window.partitionBy("qid").orderBy(col("d2").asc, col("cid"))
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select("qid", "cid")
    }
    val nQ = q.count()
    val overlap = exact.join(approx, Seq("qid", "cid"), "left_semi").count()
    val recall = overlap.toDouble / (nQ * 10)
    // 4 of ~22 cells probed: random-data recall well above the ~18% cell
    // coverage because near neighbours concentrate in the query's cells
    assert(recall > 0.25, s"recall@10 = $recall")
  }
}
