package graft.checks

/** Aggregated check registry: every implemented check, keyed by requirement
  * name. `SparkEntry.queries`/`oracleSql` are derived from this single list —
  * adding a check here wires it into the driver's verify + bench loop.
  */
object Checks {
  /** Multimodal pipeline query (decode/feature plumbing is mapPartitions —
    * Spark-only, rows-only check).
    */
  private val mediaFeatureStats = Check("media_feature_stats",
    (spark, dir) => graft.multimodal.Multimodal.mediaFeatureStats(spark, dir),
    None, isScore = false)

  /** EP1 assessment endpoints (rows-only: their correctness is transitively
    * covered by the 47 per-check oracles they union).
    */
  private val assessmentScorecard = Check("assessment_scorecard",
    (spark, dir) => graft.assess.Assessor.scorecard(spark, dir,
      graft.model.Workload.Training),
    None, isScore = false)
  private val factorRollup = Check("factor_rollup",
    (spark, dir) => graft.assess.Assessor.factorRollup(spark, dir,
      graft.model.Workload.Training),
    None, isScore = false, inBench = false)

  def all: Seq[Check] =
    Factor1.all ++ Factor2.all ++ Factor3.all ++ Factor4.all ++ Factor5.all ++
      VectorTier.all ++ TextTier.all ++ OpsTier.all ++
      Seq(mediaFeatureStats, assessmentScorecard, factorRollup)

  def byName: Map[String, Check] = all.map(c => c.name -> c).toMap
}
