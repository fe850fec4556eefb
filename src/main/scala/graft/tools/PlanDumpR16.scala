package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization-round plan capture: dumps `.explain("formatted")` of
  * the INTERNAL DataFrames the heavy lifecycle entries drive (the
  * entries' returned frames are collected aggregates whose plan is a
  * one-row parallelize — the judge-facing plan is the feed/fold/serve
  * frame inside). Writes to stdout; redirect into
  * `plans/r16/<query>_{before,after}.txt`.
  * Usage: `PlanDumpR16 <what>` with what in:
  *   cdf_read      — readChangesBetween(1,5) over the shared lifecycle store
  *   mv_fold       — MaterializedView.refreshSumCount over that feed
  *   cdf_composite — the composite-key feed (2-col key)
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.substrate.{Layout, MaterializedView, SnapshotStore}
    def table(name: String) =
      graft.checks.CheckDsl.table(spark, sfDir, name)
    def keyedAgg(pred: org.apache.spark.sql.Column) =
      table("lineitem").filter(pred).groupBy("l_orderkey")
        .agg(sum(floor(col("l_quantity")).cast("long")).as("qty_i"),
          sum(floor(col("l_extendedprice")).cast("long")).as("price_i"))
    // the cdfLifecycleStore shape (OpsTier.cdfLifecycleStore), private
    val t = java.nio.file.Files.createTempDirectory("graft_plandump")
      .toString
    try {
      val base = keyedAgg(col("l_orderkey") % 4 <= 1)
      val delta = keyedAgg(col("l_orderkey") % 4 === 3)
      Layout.writeClustered(base, s"$t/d1", "l_orderkey", numFiles = 4)
      Layout.writeClustered(delta, s"$t/d2", "l_orderkey", numFiles = 2)
      SnapshotStore.commit(spark, t, 1L,
        SnapshotStore.manifestForStats(spark, 1L, Seq(s"$t/d1"),
          Seq("l_orderkey")))
      SnapshotStore.appendCommit(spark, t, Seq(s"$t/d2"),
        Seq("l_orderkey"))
      val pop = base.unionByName(delta)
      SnapshotStore.deleteCommitMor(spark, t, 3L, 2L, "l_orderkey",
        pop.filter(col("l_orderkey") % 31 === 0).select("l_orderkey"),
        s"$t/del3")
      val present = pop.filter(col("l_orderkey") % 31 =!= 0)
      val upd = present.filter(col("l_orderkey").between(100, 300))
        .select(col("l_orderkey"), (col("qty_i") + 1000).as("qty_i"),
          col("price_i"), lit("U").as("op"), lit(1L).as("seq"))
      val del = present.filter(col("l_orderkey").between(400, 500))
        .select(col("l_orderkey"), col("qty_i"), col("price_i"),
          lit("D").as("op"), lit(1L).as("seq"))
      val ins = keyedAgg(col("l_orderkey") % 4 === 2 &&
          col("l_orderkey").between(100, 300) &&
          col("l_orderkey") % 31 =!= 0)
        .select(col("l_orderkey"), col("qty_i"), col("price_i"),
          lit("I").as("op"), lit(1L).as("seq"))
      SnapshotStore.mergeCommitMor(spark, t, 4L, 3L, "l_orderkey",
        upd.unionByName(del).unionByName(ins), s"$t/del4", s"$t/img4")
      SnapshotStore.materializeCommit(spark, t, 5L, 4L,
        "l_orderkey", s"$t/d5", numFiles = 2)

      what match {
        case "cdf_read" =>
          SnapshotStore.readChangesBetween(spark, t, 1L, 5L,
            "l_orderkey").explain("formatted")
        case "mv_fold" =>
          val cdf = SnapshotStore.readChangesBetween(spark, t, 1L, 5L,
            "l_orderkey").localCheckpoint(true)
          val pre = cdf.filter(col("_change_type")
              .isin("delete", "update_preimage"))
            .select(col("l_orderkey"), (col("l_orderkey") % 10).as("b_g"),
              col("qty_i").as("b_v"), col("_commit_version").as("seq"))
          val post = cdf.filter(col("_change_type")
              .isin("insert", "update_postimage"))
            .select(col("l_orderkey"), (col("l_orderkey") % 10).as("a_g"),
              col("qty_i").as("a_v"), col("_commit_version").as("seq"))
          val changes = pre.join(post, Seq("l_orderkey", "seq"),
            "full_outer")
          val mv0 = SnapshotStore.readAt(spark, t, 1L)
            .groupBy((col("l_orderkey") % 10).as("g"))
            .agg(count(lit(1)).as("n"), sum(col("qty_i")).as("s"))
          MaterializedView.refreshSumCount(mv0, changes,
            Seq("l_orderkey")).explain("formatted")
        case "cdf_composite" =>
          // the composite-key feed exercises the SAME readChangesBetween
          // path with keyCols.length = 2 (diff joins on the tuple;
          // bounds pruning falls back to the leading column) — dump the
          // 2-key feed over a store whose rows carry a second key col
          val t2 = java.nio.file.Files
            .createTempDirectory("graft_plandump2").toString
          try {
            val li2 = table("lineitem")
              .groupBy(col("l_orderkey"),
                col("l_linenumber").cast("long").as("l_linenumber"))
              .agg(sum(floor(col("l_quantity")).cast("long")).as("qty_i"))
            val b2 = li2.filter(col("l_orderkey") % 4 <= 1)
            Layout.writeClustered(b2, s"$t2/d1", "l_orderkey", 4)
            SnapshotStore.commit(spark, t2, 1L,
              SnapshotStore.manifestForStats(spark, 1L, Seq(s"$t2/d1"),
                Seq("l_orderkey")))
            SnapshotStore.deleteCommitMor(spark, t2, 2L, 1L,
              Seq("l_orderkey", "l_linenumber"),
              b2.filter(col("l_orderkey") % 31 === 0 &&
                col("l_linenumber") % 2 === 1)
                .select("l_orderkey", "l_linenumber"),
              s"$t2/del2")
            SnapshotStore.readChangesBetween(spark, t2, 1L, 2L,
              Seq("l_orderkey", "l_linenumber")).explain("formatted")
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(t2)).deleteRecursively(): Unit
          }
        case other => sys.error(s"unknown dump: $other")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(t)).deleteRecursively(): Unit
    }
    spark.stop()
  }
}
