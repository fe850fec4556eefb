package graft.checks

import org.apache.spark.sql.functions._

import graft.catalog.Fixtures._
import graft.checks.CheckDsl._
import graft.substrate.Graph

/** Factor 4 — Correlated: "traceable from source to every decision it
  * informs" (reference `factors/4-correlated.md:3`; stanzas
  * `factors/requirements.yaml:127-162`). Checks #30-#38 of SURVEY.md §2.A.
  *
  * The lineage checks (#31, #37) run genuine transitive closure over the
  * edge catalog (semi-naive iteration, cycle-safe — see substrate.Graph);
  * their DuckDB oracles use the equivalent recursive CTE.
  */
object Factor4 {

  private def datasetEdges(spark: org.apache.spark.sql.SparkSession) =
    lineageEdges.df(spark).filter(col("grain") === "dataset")
      .select(col("src"), col("dst"))

  /** #30 data_provenance (yaml:128-130): origin system + collection method
    * + upstream lineage all documented.
    */
  val dataProvenance = Check("data_provenance",
    (spark, _) => {
      val a = assets.df(spark)
      val le = lineageEdges.df(spark)
      val withUpstream = a.join(broadcast(le.filter(col("grain") === "dataset")),
        a("asset") === le("dst"), "left_semi")
      val documented = withUpstream.filter(
        col("origin_system").isNotNull && col("collection_method").isNotNull)
      fractionDf(spark, "data_provenance", cnt(documented), cnt(a))
    },
    Some(fractionSql("data_provenance",
      "SELECT COUNT(*) FROM assets a WHERE origin_system IS NOT NULL AND collection_method IS NOT NULL AND EXISTS (SELECT 1 FROM lineage_edges e WHERE e.dst = a.asset AND e.grain = 'dataset')",
      "SELECT COUNT(*) FROM assets", Seq(assets, lineageEdges))))

  /** #31 lineage_completeness (yaml:132-134): dataset-grain reachability
    * from a source-system node (transitive) AND at least one field-grain
    * edge — "dataset AND field level".
    */
  val lineageCompleteness = Check("lineage_completeness",
    (spark, _) => {
      val a = assets.df(spark)
      val reach = Graph.reachable(datasetEdges(spark),
        lineageSources.df(spark))
      val fieldDst = lineageEdges.df(spark).filter(col("grain") === "field")
        .select(col("dst").as("node")).distinct()
      val complete = a
        .join(broadcast(reach), a("asset") === reach("node"), "left_semi")
        .join(broadcast(fieldDst), a("asset") === fieldDst("node"), "left_semi")
      fractionDf(spark, "lineage_completeness", cnt(complete), cnt(a))
    },
    Some {
      val reachCte =
        """reach(node) AS (SELECT node FROM lineage_sources
          |UNION SELECT e.dst FROM lineage_edges e JOIN reach r
          |ON e.src = r.node WHERE e.grain = 'dataset')"""
          .stripMargin.replace("\n", " ")
      fractionSql("lineage_completeness",
        "SELECT COUNT(*) FROM assets a WHERE EXISTS (SELECT 1 FROM reach r WHERE r.node = a.asset) AND EXISTS (SELECT 1 FROM lineage_edges e WHERE e.dst = a.asset AND e.grain = 'field')",
        "SELECT COUNT(*) FROM assets",
        Seq(assets, lineageEdges, lineageSources), Seq(reachCte))
    })

  /** #32 data_version_coverage (yaml:136-138): immutable version ids. */
  val dataVersionCoverage = Check("data_version_coverage",
    (spark, _) => {
      val a = assets.df(spark)
      fractionDf(spark, "data_version_coverage",
        cnt(a.filter(col("version_id").isNotNull && col("immutable"))), cnt(a))
    },
    Some(fractionSql("data_version_coverage",
      "SELECT COUNT(*) FROM assets WHERE version_id IS NOT NULL AND immutable",
      "SELECT COUNT(*) FROM assets", Seq(assets))))

  /** #33 agent_attribution (yaml:140-142): runs are the modification log. */
  val agentAttribution = Check("agent_attribution",
    (spark, _) => {
      val r = pipelineRuns.df(spark)
      fractionDf(spark, "agent_attribution",
        cnt(r.filter(col("agent").isNotNull)), cnt(r))
    },
    Some(fractionSql("agent_attribution",
      "SELECT COUNT(*) FROM pipeline_runs WHERE agent IS NOT NULL",
      "SELECT COUNT(*) FROM pipeline_runs", Seq(pipelineRuns))))

  /** #34 pipeline_execution_audit (yaml:144-146): inputs, parameters,
    * outputs, completion status all recorded.
    */
  val pipelineExecutionAudit = Check("pipeline_execution_audit",
    (spark, _) => {
      val r = pipelineRuns.df(spark)
      val complete = r.filter(size(col("inputs")) > 0 &&
        col("params").isNotNull && size(col("outputs")) > 0 &&
        col("status").isNotNull)
      fractionDf(spark, "pipeline_execution_audit", cnt(complete), cnt(r))
    },
    Some(fractionSql("pipeline_execution_audit",
      "SELECT COUNT(*) FROM pipeline_runs WHERE len(inputs) > 0 AND params IS NOT NULL AND len(outputs) > 0 AND status IS NOT NULL",
      "SELECT COUNT(*) FROM pipeline_runs", Seq(pipelineRuns))))

  /** #35 dependency_graph_completeness (yaml:148-150): upstream AND
    * downstream fully enumerated.
    */
  val dependencyGraphCompleteness = Check("dependency_graph_completeness",
    (spark, _) => {
      val a = assets.df(spark)
      fractionDf(spark, "dependency_graph_completeness",
        cnt(a.filter(col("upstream_enumerated") && col("downstream_enumerated"))),
        cnt(a))
    },
    Some(fractionSql("dependency_graph_completeness",
      "SELECT COUNT(*) FROM assets WHERE upstream_enumerated AND downstream_enumerated",
      "SELECT COUNT(*) FROM assets", Seq(assets))))

  /** #36 record_level_traceability (yaml:152-154): record grain on the
    * events stream — correlation id non-null AND unique. A column-pruned
    * single-pass groupBy at any scale (map-side partial agg).
    */
  val recordLevelTraceability = Check("record_level_traceability",
    (spark, dir) => {
      val e = table(spark, dir, "events")
      val traceable = e.filter(col("event_id").isNotNull)
        .groupBy("event_id").count().filter(col("count") === 1)
      fractionDf(spark, "record_level_traceability", cnt(traceable), cnt(e))
    },
    Some(fractionSql("record_level_traceability",
      "SELECT COUNT(*) FROM (SELECT event_id FROM events WHERE event_id IS NOT NULL GROUP BY event_id HAVING COUNT(*) = 1)",
      "SELECT COUNT(*) FROM events", Nil)))

  /** #37 impact_analysis_capability (yaml:156-158): downstream impact is
    * automatically enumerable — the dataset participates in the lineage
    * graph (its closure is computable; cycle-guarded by construction).
    */
  val impactAnalysisCapability = Check("impact_analysis_capability",
    (spark, _) => {
      val a = assets.df(spark)
      val de = datasetEdges(spark)
      val nodes = de.select(col("src").as("node"))
        .unionAll(de.select(col("dst").as("node"))).distinct()
      val inGraph = a.join(broadcast(nodes), a("asset") === nodes("node"), "left_semi")
      fractionDf(spark, "impact_analysis_capability", cnt(inGraph), cnt(a))
    },
    Some(fractionSql("impact_analysis_capability",
      "SELECT COUNT(*) FROM assets a WHERE EXISTS (SELECT 1 FROM (SELECT src AS node FROM lineage_edges WHERE grain = 'dataset' UNION SELECT dst FROM lineage_edges WHERE grain = 'dataset') n WHERE n.node = a.asset)",
      "SELECT COUNT(*) FROM assets", Seq(assets, lineageEdges))))

  /** #38 transformation_documentation (yaml:160-162). */
  val transformationDocumentation = Check("transformation_documentation",
    (spark, _) => {
      val t = transformations.df(spark)
      val documented = t.filter(col("logic_doc").isNotNull &&
        size(col("inputs")) > 0 && size(col("outputs")) > 0)
      fractionDf(spark, "transformation_documentation", cnt(documented), cnt(t))
    },
    Some(fractionSql("transformation_documentation",
      "SELECT COUNT(*) FROM transformations WHERE logic_doc IS NOT NULL AND len(inputs) > 0 AND len(outputs) > 0",
      "SELECT COUNT(*) FROM transformations", Seq(transformations))))

  /** Extension operator `lineage_impact`: the FULL downstream transitive
    * closure as (asset, downstream) pairs — what #37 scores the existence
    * of, enumerated (reference `4-correlated.md:15` "impact analysis").
    * Multi-row output; oracle = recursive CTE.
    */
  val lineageImpact = Check("lineage_impact",
    (spark, _) => {
      Graph.closure(datasetEdges(spark))
        .toDF("asset", "downstream")
        .orderBy("asset", "downstream")
    },
    Some {
      val cte =
        """closure(asset, downstream) AS (
          |SELECT src, dst FROM lineage_edges WHERE grain = 'dataset'
          |UNION SELECT c.asset, e.dst FROM closure c
          |JOIN lineage_edges e ON e.src = c.downstream
          |WHERE e.grain = 'dataset')""".stripMargin.replace("\n", " ")
      graft.catalog.Fixture.oracle(Seq(lineageEdges),
        "SELECT asset, downstream FROM closure ORDER BY asset, downstream",
        Seq(cte))
    },
    isScore = false)

  val all: Seq[Check] = Seq(dataProvenance, lineageCompleteness,
    dataVersionCoverage, agentAttribution, pipelineExecutionAudit,
    dependencyGraphCompleteness, recordLevelTraceability,
    impactAnalysisCapability, transformationDocumentation, lineageImpact)
}
