package graft.tools

import org.apache.spark.sql.SparkSession

import graft.checks.Checks

/** Plan audit harness: prints the formatted physical plan of selected
  * queries so scan pruning (ReadSchema), pushed filters, join strategies,
  * and codegen coverage can be inspected (the builder discipline: iterate
  * until the plan is the one you'd WANT at 100 TB, not the first one that
  * passes).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "embedding_coverage", "data_freshness", "consent_coverage",
      "record_level_traceability", "knn_exact_cosine", "dedup_exact",
      "sequence_pack", "dup_span_stats", "retrieval_recall_compliance",
      "neardup_cosine_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Checks.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
