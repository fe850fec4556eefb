package graft

import org.apache.spark.sql.SparkSession

import graft.assess.Assessor
import graft.model.Workload

/** User-facing assessment runner (EP1): score a dataset directory against
  * the framework's requirements for a workload and write/print the
  * scorecard + factor rollup.
  *
  * Usage: runMain graft.Assess <sfDir> [serving|training] [outDir]
  */
object Assess {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workload = args.lift(1).getOrElse("training") match {
      case "serving" => Workload.Serving
      case _         => Workload.Training
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // scorecard is eager (local rows) — no cache needed for the rollup
    val sc = Assessor.scorecard(spark, dir, workload)
    val ru = Assessor.rollupOf(sc)
    args.lift(2).foreach { out =>
      sc.coalesce(1).write.mode("overwrite").parquet(s"$out/scorecard")
      ru.coalesce(1).write.mode("overwrite").parquet(s"$out/factor_rollup")
    }
    println(s"=== scorecard ($dir, ${workload.name}) ===")
    sc.show(50, truncate = false)
    println("=== factor rollup ===")
    ru.show(10, truncate = false)
    spark.stop()
  }
}
