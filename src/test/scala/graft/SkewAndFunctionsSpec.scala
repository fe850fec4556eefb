package graft

import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.functions._

import graft.substrate.SkewOps

class SkewAndFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches plain groupBy on a skewed key distribution") {
    // key 'hot' carries 10k rows, others 10 each
    val df = ((1 to 10000).map(_ => "hot") ++
      (1 to 10).flatMap(i => Seq.fill(10)(s"k$i"))).toDF("k")
    val plain = df.groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedAgg(df, Seq("k"), salts = 16,
      partial = Seq(count(lit(1)).as("c")), merge = Seq(sum("c").as("c")))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("hotKeySplitJoin matches a plain join") {
    val left = ((1 to 1000).map(_ => (1L, "l")) ++ Seq((2L, "x"), (3L, "y"))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (2L, "r2"), (4L, "r4")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).as[(Long, String, String)]
      .collect().sorted.toSeq
    val split = SkewOps.hotKeySplitJoin(left, right, "k", hotKeys = Seq(1L))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(split == plain)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import org.apache.spark.sql.functions._
    // one hot key carrying ~all rows vs a long tail; thresholds lowered so
    // the test-sized skew triggers the same OptimizeSkewedJoin rule that
    // fires at production sizes — the runtime complement to SkewOps'
    // explicit salting
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val left = spark.range(0, 20000)
        .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("x"), col("id")).as("pad"))
      val right = spark.range(0, 200).select(col("id").as("k"),
        lit("dim").as("v"))
      val joined = left.join(right, "k")
      // execute THIS dataframe (count() would plan a separate query and
      // leave joined's own AQE plan unfinalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("registered SQL functions evaluate the native expressions") {
    GraftColumn.registerFunctions(spark)
    val dot = spark.sql(
      "SELECT graft_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head()
    assert(dot == 11.0)
    val sq = spark.sql(
      "SELECT graft_array_sqdist(array(0.0D, 0.0D), array(3.0D, 4.0D))")
      .as[Double].head()
    assert(sq == 25.0)
    val sh = spark.sql(
      "SELECT graft_word_shingles(array('a','b','c','d'), 3)")
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
  }
}
