package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 optimization-round plan capture (the PlanDumpR16 discipline):
  * dumps `.explain("formatted")` of the frames whose PLAN SHAPE the r17
  * metadata-I/O work changed — commit metadata served as LocalRelations
  * instead of parquet scan jobs. Writes to stdout; redirect into
  * `plans/r17/<query>_{before,after}.txt`. Usage: `PlanDumpR17 <what>`:
  *   manifest      — SnapshotStore.manifest over a 3-commit store (the
  *                   frame every readAt/vacuum/changedFiles resolution
  *                   consumes)
  *   serve         — PqIndex.topK over a fresh VectorArtifact.loadLatest
  *                   (the stored-index serve: centroids/codebook source)
  *   entry_result  — the collected-rows result frame the entries return
  *                   (snapshot_count_meta shape)
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.substrate.{IvfPq, Layout, PqIndex, SnapshotStore,
      VectorArtifact}
    def table(name: String) =
      graft.checks.CheckDsl.table(spark, sfDir, name)
    val t = java.nio.file.Files.createTempDirectory("graft_plandump17")
      .toString
    try {
      what match {
        case "manifest" =>
          val agg = table("lineitem").groupBy("l_orderkey")
            .agg(sum(floor(col("l_quantity")).cast("long")).as("qty_i"))
          Layout.writeClustered(agg.filter(col("l_orderkey") % 4 <= 1),
            s"$t/d1", "l_orderkey", numFiles = 4)
          Layout.writeClustered(agg.filter(col("l_orderkey") % 4 === 2),
            s"$t/d2", "l_orderkey", numFiles = 2)
          Layout.writeClustered(agg.filter(col("l_orderkey") % 4 === 3),
            s"$t/d3", "l_orderkey", numFiles = 2)
          SnapshotStore.commit(spark, t, 1L,
            SnapshotStore.manifestForStats(spark, 1L, Seq(s"$t/d1"),
              Seq("l_orderkey")))
          SnapshotStore.appendCommit(spark, t, Seq(s"$t/d2"),
            Seq("l_orderkey"))
          SnapshotStore.appendCommit(spark, t, Seq(s"$t/d3"),
            Seq("l_orderkey"))
          SnapshotStore.manifest(spark, t).explain("formatted")
        case "serve" =>
          val e = table("embeddings")
            .select(col("vec_id"),
              graft.substrate.VectorOps.toDoubleArr(col("embedding"))
                .as("v"))
          val cents = IvfPq.servingCentroids(e, centroidMod = 23)
          val cb = PqIndex.codebookArrays(
            PqIndex.codebooks(e, "vec_id", "v", dim = 64))
          val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v",
              nProbe = 1)
            .select(col("qid").as("vec_id"), col("cell"))
          val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = 64)
            .join(asg, Seq("vec_id"))
          VectorArtifact.saveClustered(spark, t, 0L, dim = 64, cents,
            cb, codes)
          val a = VectorArtifact.loadLatest(spark, t)
          val q = e.filter(col("vec_id") % 20 === 0)
            .select(col("vec_id").as("qid"), col("v").as("qv"))
          PqIndex.topK(a.codes, q, "qid", "qv", a.cb, dim = 64,
            topK = 4).explain("formatted")
          // the centroid source a probed serve broadcasts:
          a.centroids.explain("formatted")
        case "entry_result" =>
          val rows = Seq(org.apache.spark.sql.Row(1L, 2L),
            org.apache.spark.sql.Row(2L, 3L))
          // the shape every entry returns after collecting its pins —
          // r16: parallelize(rows, 1); r17: LocalRelation
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("version",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType)))
          spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), schema)
            .explain("formatted")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(t)).deleteRecursively()
    }
    spark.stop()
  }
}
