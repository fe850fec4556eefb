package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — at 100 TB, a selective dimension
  * filter should prune the fact-side scan via an injected bloom filter
  * instead of shuffling every fact row into the join. This pins that the
  * optimizer setting works against our data shapes.
  */
class BloomFilterJoinSpec extends SparkSpec {

  test("selective join injects a runtime bloom filter on the fact side") {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val plan = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom"),
        s"no runtime bloom filter injected:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
