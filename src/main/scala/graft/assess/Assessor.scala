package graft.assess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.Checks
import graft.model.{Registry, Workload}

/** Thresholds per requirement × workload. The reference's `meta.yaml`
  * (referenced at `factors/requirements.yaml:5`) is absent from the
  * snapshot, so thresholds are engine-defined in ONE place (SURVEY.md §7f):
  * serving is the stricter bar; "Requirements and thresholds are defined
  * per factor and per workload" (`definitions.md:39`).
  */
object Thresholds {
  private val byWorkload: Map[Workload, Double] = Map(
    Workload.Serving -> 0.7, Workload.Training -> 0.6)
  private val overrides: Map[(String, Workload), Double] = Map(
    // record-grain integrity checks demand near-totality
    ("temporal_referential_integrity", Workload.Serving) -> 0.99,
    ("temporal_referential_integrity", Workload.Training) -> 0.99,
    ("record_level_traceability", Workload.Serving) -> 0.99,
    ("record_level_traceability", Workload.Training) -> 0.99,
    ("point_lookup_availability", Workload.Serving) -> 0.95,
    ("consent_coverage", Workload.Serving) -> 0.75,
    ("consent_coverage", Workload.Training) -> 0.75)

  def forReq(key: String, w: Workload): Double =
    overrides.getOrElse((key, w), byWorkload(w))
}

/** EP1 — full assessment (SURVEY.md §3): resolve requirements for the
  * workload, run every implemented check, evaluate against thresholds,
  * roll up per factor ("automated assessments or dashboards",
  * reference `README.md:43-45`).
  *
  * All per-check plans are pure DataFrame algebra unioned into ONE lazy
  * plan — Catalyst sees the whole assessment at once (shared scans get
  * reused via exchange reuse; execution is a single action).
  */
object Assessor {

  /** Per-requirement scorecard for a workload. */
  def scorecard(spark: SparkSession, dir: String, workload: Workload): DataFrame = {
    val applicable = Registry.forWorkload(workload).map(_.key).toSet
    val runs = Checks.all.filter(c => c.isScore && applicable.contains(c.name))
    val unioned = runs.map(_.run(spark, dir)).reduce(_ unionAll _)
    val meta = Registry.all.map(r =>
      (r.key, r.factor.id, r.factor.name,
        Thresholds.forReq(r.key, workload)))
    val metaDf = spark.createDataFrame(meta)
      .toDF("requirement", "factor", "factor_name", "threshold")
    unioned.join(broadcast(metaDf), Seq("requirement"))
      .select(col("requirement"), col("factor"), col("factor_name"),
        lit(workload.name).as("workload"), col("value"), col("threshold"),
        (col("value") >= col("threshold")).as("passed"))
      .orderBy("factor", "requirement")
  }

  /** Factor rollup: avg score + pass fraction per factor (the dashboard
    * row contract, `README.md:45`).
    */
  def factorRollup(spark: SparkSession, dir: String, workload: Workload): DataFrame =
    scorecard(spark, dir, workload)
      .groupBy("factor", "factor_name")
      .agg(
        count(lit(1)).as("n_checks"),
        avg("value").as("avg_score"),
        avg(when(col("passed"), 1.0).otherwise(0.0)).as("pass_rate"))
      .orderBy("factor")
}
