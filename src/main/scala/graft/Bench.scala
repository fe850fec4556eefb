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
    // Full per-query breakdown goes to stderr (debugging); the stdout JSON
    // line must stay SHORT — the round driver captures only the last 2000
    // chars of stdout, and round 1's ~2900-char all-queries line was
    // truncated past recognition (BENCH_r01.json parsed:null). Emit the
    // summary + the 12 slowest queries, values rounded to ms.
    val r3 = (v: Double) => math.rint(v * 1000) / 1000
    System.err.println(results.map { case (k, v) => s"\"$k\":${r3(v)}" }
      .mkString("[bench] all: {", ",", "}"))
    val nFailed = results.count(_._2 < 0)
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (k, v) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
    // a failing bench query must fail the run, not just shrink the total
    if (nFailed > 0) sys.exit(1)
  }
}
