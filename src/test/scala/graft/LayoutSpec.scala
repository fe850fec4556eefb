package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.substrate.Layout

/** Proof of the co-located-join layout claim: same-bucketed tables join
  * with NO shuffle exchange in the physical plan.
  */
class LayoutSpec extends SparkSpec {

  test("same-key bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      Layout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
      Layout.writeBucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges")
      // and it computes the same result as the unbucketed join
      val expected = orders
        .join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .count()
      assert(joined.count() > 0 &&
        spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("hive-partitioned layout prunes non-matching partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      val docs = graft.checks.CheckDsl.table(spark, sf, "documents")
        .select("doc_id", "source", "text")
      graft.sources.Io.writeParquet(docs, dir, partitionBy = Seq("source"))
      val one = docs.select("source").distinct().limit(1)
        .collect().head.getString(0)
      val q = graft.sources.Io.readParquet(spark, dir)
        .filter(col("source") === one).select("doc_id")
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // the source predicate must land in PartitionFilters (pruned at
      // planning), NOT as a post-scan data filter over all partitions
      val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
        .getOrElse(fail(s"no PartitionFilters in:\n$plan"))
      assert(pf.contains("source"), s"partition filter not pushed: $pf")
      assert(q.count() == docs.filter(col("source") === one).count())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
