package graft

import org.apache.spark.sql.functions._

import graft.checks.PipelineTier

/** Corpus-construction tier: deterministic sampling/splitting and
  * repetition scoring (PipelineTier), plus the planted-near-dup witness for
  * the portable banded MinHash.
  */
class PipelineTierSpec extends SparkSpec {
  import spark.implicits._

  test("train_test_split covers every doc exactly once and is deterministic") {
    val out = PipelineTier.trainTestSplit.run(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // split counts per source sum back to the stratum population
    val summed = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("docs")).sum).toMap
    assert(summed == perSource)
    // fractions per source sum to 1
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("frac")).sum - 1.0) < 1e-12)
    }
    // hash assignment is a pure function of doc_id: rerun is identical
    val again = PipelineTier.trainTestSplit.run(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("stratified_sample rate is the observed hash-keep fraction") {
    val out = PipelineTier.stratifiedSample.run(spark, sf).collect()
    out.foreach { r =>
      val (pop, sampled, rate) = (r.getAs[Long]("population"),
        r.getAs[Long]("sampled"), r.getAs[Double]("rate"))
      assert(sampled <= pop)
      assert(rate == sampled.toDouble / pop)
    }
    // global keep fraction is near 10% (hash uniformity; loose bound)
    val (tot, kept) = (out.map(_.getAs[Long]("population")).sum,
      out.map(_.getAs[Long]("sampled")).sum)
    assert(kept.toDouble / tot > 0.03 && kept.toDouble / tot < 0.25)
  }

  test("repetition score: constructed repeat vs all-distinct doc") {
    // "a b a b a b": 4 trigram slots, 2 distinct ("a b a", "b a b") -> 0.5
    val df = Seq((1L, "a b a b a b"), (2L, "v w x y z"), (3L, "one two"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("pipeline_spec_docs")
    val scored = df.select(col("doc_id"),
      greatest(size(graft.substrate.TextOps.tokens(col("text"))) - 2, lit(0))
        .cast("long").as("n_trigrams"),
      size(graft.substrate.TextOps.wordTrigrams(col("text"))).cast("long")
        .as("n_distinct"))
      .select(col("doc_id"), col("n_trigrams"), col("n_distinct"),
        when(col("n_trigrams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_trigrams"))
          .otherwise(lit(0.0)).as("repetition"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(scored(1L) == ((4L, 2L, 0.5)))
    assert(scored(2L) == ((3L, 3L, 0.0)))
    assert(scored(3L) == ((0L, 0L, 0.0))) // sub-trigram doc: defined as 0
  }

  test("portable banded MinHash surfaces every planted near-dup pair") {
    val out = PipelineTier.dedupMinhashBanded.run(spark, sf)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("jaccard")))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // planted copies exist for doc_id % 100 == 0 with >= 7 tokens (below
    // that, dropping the first token pushes Jaccard under the threshold)
    val planted = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"),
        size(graft.substrate.TextOps.tokens(col("text"))).as("n"))
      .collect().filter(_.getAs[Int]("n") >= 12).map(_.getLong(0))
    assert(planted.nonEmpty)
    val pairs = out.map(p => (p._1, p._2)).toSet
    planted.foreach { id =>
      assert(pairs.contains((id, id + 1000000L)),
        s"planted pair ($id, ${id + 1000000L}) not found")
    }
    out.foreach(p => assert(p._3 >= 0.5 && p._3 <= 1.0))
  }

  test("batch sessionize agrees with streaming session_window on real events") {
    // same gap rule (new session at gap >= 30 min) → the session-size
    // histograms must be identical on the same corpus
    val batchHist = graft.checks.Checks.byName("sessionize").run(spark, sf)
      .as[(Long, Long)].collect().toMap
    val ev = graft.checks.CheckDsl.table(spark, sf, "events")
      .select(col("user_id"), col("ts"))
    val streamOpHist = graft.streaming.FreshnessMonitor.sessionize(ev)
      .groupBy("n_events").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(batchHist == streamOpHist,
      s"batch $batchHist != session_window $streamOpHist")
  }
  test("corpus_mix_temperature: min stratum keeps all; rebalance toward alpha targets") {
    val out = PipelineTier.corpusMixTemperature.run(spark, sf).collect()
    val pops = out.map(r => r.getString(0) -> r.getAs[Long]("population")).toMap
    val minLang = pops.minBy { case (l, n) => (n, l) }._1
    // the smallest stratum's rate is exactly 1.0 -> every doc kept
    val minRow = out.find(_.getString(0) == minLang).get
    assert(minRow.getAs[Double]("rate") == 1.0)
    assert(minRow.getAs[Long]("sampled") == minRow.getAs[Long]("population"))
    // every stratum: sampled <= population, rate in (0, 1]
    out.foreach { r =>
      assert(r.getAs[Long]("sampled") <= r.getAs[Long]("population"))
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // the rebalance claim: achieved shares sit closer to the alpha
    // targets than the natural (population) shares do, in L1 distance
    val totPop = pops.values.sum.toDouble
    val l1Natural = out.map(r => math.abs(
      r.getAs[Long]("population") / totPop - r.getAs[Double]("target_share"))).sum
    val l1Achieved = out.map(r => math.abs(
      r.getAs[Double]("achieved_share") - r.getAs[Double]("target_share"))).sum
    assert(l1Achieved < l1Natural,
      s"achieved L1 $l1Achieved should beat natural L1 $l1Natural")
    // achieved shares form a distribution
    assert(math.abs(out.map(_.getAs[Double]("achieved_share")).sum - 1.0) < 1e-12)
  }
}
