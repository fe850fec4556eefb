package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution for one registry entry: runs the query with a
  * listener that records every Spark job's wall and callsite/description,
  * then prints the jobs sorted by cost. TimeOne answers "how slow";
  * this answers "which action inside the entry" — the measure-first
  * loop of the optimization guide (§1: decide WHERE the time goes
  * before touching anything). Usage:
  * `ProfileOne <name> [sfDir] [runs=2]` (SPARK_GRAFT_CPUS honored).
  * The LAST run's jobs are printed (first run carries JIT/fixture
  * builds; sharedStore fixtures are per-JVM so run 2 is the steady
  * state the bench's median sees).
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "512"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording.get()) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
          jobs.put(js.jobId, Job(js.jobId, desc, js.time))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })
    val check = graft.checks.Checks.byName(name)
    (1 to runs).foreach { i =>
      if (i == runs) { jobs.clear(); recording.set(true) }
      val t0 = System.nanoTime()
      val n = check.run(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] run$i $wall%.2f s rows=$n")
      if (i == runs) {
        recording.set(false)
        import scala.jdk.CollectionConverters._
        val done = jobs.values.asScala.filter(_.end > 0).toSeq
        val total = done.map(j => j.end - j.start).sum / 1e3
        println(f"[profile] ${done.size} jobs, job-time sum $total%.2f s " +
          f"(wall $wall%.2f s; gap = driver/planning time)")
        done.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
          println(f"[profile]  ${(j.end - j.start) / 1e3}%7.3f s  job=${j.id}%4d  ${j.desc.take(110)}")
        }
        // roll up by callsite so N repeated small actions still surface
        done.groupBy(_.desc).map { case (d, js) =>
          (d, js.map(j => j.end - j.start).sum / 1e3, js.size)
        }.toSeq.sortBy(-_._2).take(25).foreach { case (d, s, c) =>
          println(f"[profile]  SUM $s%7.3f s  n=$c%3d  ${d.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
