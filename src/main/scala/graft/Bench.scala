package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE coalesce post-shuffle partitions to the advisory size —
      // at high core counts the default parallelism-first split leaves
      // tiny partitions whose task overhead dominates small-SF runs
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer reads land here, not
    // in whichever query happens to run first
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    } catch { case _: Throwable => () }
    // registry order: cheap metadata checks run (and warm the session)
    // before the heavy union/LSH queries
    val bench = graft.checks.Checks.all.filter(_.inBench)
      .map(c => c.name -> c.run)
    val results = bench.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // release per-operator persists (untimed)
      // failed queries report -1, never a fast-looking elapsed time
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
