package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runs one registry query N times in a warm
  * JVM and prints each wall — the per-entry profiling loop Bench's full
  * suite is too coarse for. Usage:
  * `TimeOne <name> <sfDir> [runs=3]` (SPARK_GRAFT_CPUS honored).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val check = graft.checks.Checks.byName(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = check.run(spark, sfDir).count()
      println(f"[timeone] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
