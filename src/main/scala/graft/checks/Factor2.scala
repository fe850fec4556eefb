package graft.checks

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Fixtures._
import graft.checks.CheckDsl._

/** Factor 2 — Consumable: "served in the right format and at the right
  * latencies" (reference `factors/2-consumable.md:3`; stanzas
  * `factors/requirements.yaml:41-88`). Checks #9-#20 of SURVEY.md §2.A.
  *
  * #19 (LSH recall) lives in VectorTier with the deterministic BrpLsh
  * oracle.
  */
object Factor2 {

  /** #9 access_optimization (yaml:42-44): large tables (bytes > 1 MB here;
    * a config knob in production) must declare clustering/layout keys.
    */
  val accessOptimization = Check("access_optimization",
    (spark, _) => {
      val large = assets.df(spark).filter(col("bytes") > 1000000L)
      fractionDf(spark, "access_optimization",
        cnt(large.filter(size(col("layout_keys")) > 0)), cnt(large))
    },
    Some(fractionSql("access_optimization",
      "SELECT COUNT(*) FROM assets WHERE bytes > 1000000 AND len(layout_keys) > 0",
      "SELECT COUNT(*) FROM assets WHERE bytes > 1000000", Seq(assets))))

  /** #10 search_optimization (yaml:46-48): population = text-bearing
    * tables; a hit needs the catalog flag AND a registered search-index
    * artifact at least as fresh as the asset (the load-bearing witness —
    * #15's vector_indexes precedent, VERDICT r8 #8): the flag alone no
    * longer scores, the InvertedIndex companion's catalog row must exist.
    */
  val searchOptimization = Check("search_optimization",
    (spark, _) => {
      val tb = assets.df(spark).filter(col("text_bearing"))
      val si = searchIndexes.df(spark)
      val indexed = tb.filter(col("search_index")).join(broadcast(si),
        tb("asset") === si("collection") &&
          si("built_at") >= tb("last_modified"), "left_semi")
      fractionDf(spark, "search_optimization", cnt(indexed), cnt(tb))
    },
    Some(fractionSql("search_optimization",
      "SELECT COUNT(*) FROM assets a WHERE a.text_bearing AND a.search_index AND EXISTS (SELECT 1 FROM search_indexes si WHERE si.collection = a.asset AND si.built_at >= a.last_modified)",
      "SELECT COUNT(*) FROM assets WHERE text_bearing",
      Seq(assets, searchIndexes))))

  /** #11 serving_latency_compliance (yaml:50-52): p99 per endpoint vs SLA.
    * p99 is EXACT and engine-portable: smallest latency whose cume_dist
    * ≥ 0.99 (`percentile_approx` would not hash-match an exact oracle).
    * Distributes as one shuffle on endpoint + window sort within partition.
    */
  val servingLatencyCompliance = Check("serving_latency_compliance",
    (spark, _) => {
      val lat = endpointsLatency.df(spark)
      val w = Window.partitionBy("endpoint").orderBy("latency_ms")
      val p99 = lat.withColumn("cd", cume_dist().over(w))
        .filter(col("cd") >= 0.99)
        .groupBy("endpoint").agg(min("latency_ms").as("p99"))
      val ok = p99.join(broadcast(endpointSla.df(spark)), Seq("endpoint"))
        .filter(col("p99") <= col("sla_ms"))
      fractionDf(spark, "serving_latency_compliance",
        cnt(ok), cnt(endpointSla.df(spark)))
    },
    Some {
      val p99Cte =
        """p99s AS (SELECT endpoint, MIN(latency_ms) AS p99 FROM (
          |SELECT endpoint, latency_ms,
          |cume_dist() OVER (PARTITION BY endpoint ORDER BY latency_ms) AS cd
          |FROM endpoints_latency) WHERE cd >= 0.99 GROUP BY endpoint)"""
          .stripMargin.replace("\n", " ")
      fractionSql("serving_latency_compliance",
        "SELECT COUNT(*) FROM p99s p JOIN endpoint_sla s ON p.endpoint = s.endpoint WHERE p.p99 <= s.sla_ms",
        "SELECT COUNT(*) FROM endpoint_sla",
        Seq(endpointsLatency, endpointSla), Seq(p99Cte))
    })

  /** #12 embedding_coverage (yaml:54-56): documents with a pre-computed
    * embedding. Data-probing: semi join documents → embeddings. At scale
    * this is the one Factor-2 check that shuffles two big tables; both
    * sides are pre-bucketable on the id.
    */
  val embeddingCoverage = Check("embedding_coverage",
    (spark, dir) => {
      val docs = table(spark, dir, "documents")
      val embs = table(spark, dir, "embeddings")
      val covered = docs.join(embs, docs("doc_id") === embs("vec_id"), "left_semi")
      fractionDf(spark, "embedding_coverage", cnt(covered), cnt(docs))
    },
    Some(fractionSql("embedding_coverage",
      "SELECT COUNT(*) FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)",
      "SELECT COUNT(*) FROM documents", Nil)))

  /** #13 feature_materialization_coverage (yaml:58-60): features present in
    * BOTH online and offline stores.
    */
  val featureMaterializationCoverage = Check("feature_materialization_coverage",
    (spark, _) => {
      val fc = featureCatalog.df(spark)
      val both = fc.groupBy("feature")
        .agg(countDistinct("store").as("stores")).filter(col("stores") === 2)
      fractionDf(spark, "feature_materialization_coverage",
        cnt(both), cnt(fc.select("feature").distinct()))
    },
    Some(fractionSql("feature_materialization_coverage",
      "SELECT COUNT(*) FROM (SELECT feature FROM feature_catalog GROUP BY feature HAVING COUNT(DISTINCT store) = 2)",
      "SELECT COUNT(DISTINCT feature) FROM feature_catalog",
      Seq(featureCatalog))))

  /** #14 native_format_availability (yaml:62-64; formats per
    * `2-consumable.md:17`: "Native formats (Parquet, JSON, vectors)").
    */
  val nativeFormatAvailability = Check("native_format_availability",
    (spark, _) => {
      val a = assets.df(spark)
      fractionDf(spark, "native_format_availability",
        cnt(a.filter(col("format").isin("parquet", "json", "vector"))), cnt(a))
    },
    Some(fractionSql("native_format_availability",
      "SELECT COUNT(*) FROM assets WHERE format IN ('parquet', 'json', 'vector')",
      "SELECT COUNT(*) FROM assets", Seq(assets))))

  /** #15 vector_index_coverage (yaml:66-68): embedding collections with a
    * registered index artifact at least as fresh as the collection.
    */
  val vectorIndexCoverage = Check("vector_index_coverage",
    (spark, _) => {
      val colls = assets.df(spark)
        .filter(col("kind") === "collection" && col("format") === "vector")
      val vi = vectorIndexes.df(spark)
      val indexed = colls.join(broadcast(vi),
        colls("asset") === vi("collection") &&
          vi("built_at") >= colls("last_modified"), "left_semi")
      fractionDf(spark, "vector_index_coverage", cnt(indexed), cnt(colls))
    },
    Some(fractionSql("vector_index_coverage",
      "SELECT COUNT(*) FROM assets a WHERE kind = 'collection' AND format = 'vector' AND EXISTS (SELECT 1 FROM vector_indexes vi WHERE vi.collection = a.asset AND vi.built_at >= a.last_modified)",
      "SELECT COUNT(*) FROM assets WHERE kind = 'collection' AND format = 'vector'",
      Seq(assets, vectorIndexes))))

  /** #16 chunk_readiness (yaml:70-72): documents chunked with every chunk
    * within the context window. Unchunked documents count 0 (left join from
    * documents).
    */
  val chunkReadiness = Check("chunk_readiness",
    (spark, dir) => {
      val docs = table(spark, dir, "documents")
      val ok = chunks.df(spark).groupBy("doc_id")
        .agg(max("chunk_tokens").as("mx"))
        .filter(col("mx") <= CtxWindowTokens)
      fractionDf(spark, "chunk_readiness",
        cnt(docs.join(broadcast(ok), Seq("doc_id"), "left_semi")), cnt(docs))
    },
    Some(fractionSql("chunk_readiness",
      s"SELECT COUNT(*) FROM documents WHERE doc_id IN (SELECT doc_id FROM chunks GROUP BY doc_id HAVING MAX(chunk_tokens) <= $CtxWindowTokens)",
      "SELECT COUNT(*) FROM documents", Seq(chunks))))

  /** #17 batch_throughput_sufficiency (yaml:74-76): latest run's measured
    * throughput vs required ("I/O bottlenecks cause expensive GPU idle
    * time", `2-consumable.md:25`).
    */
  val batchThroughputSufficiency = Check("batch_throughput_sufficiency",
    (spark, _) => {
      val w = Window.partitionBy("pipeline").orderBy(col("start_ts").desc)
      val latest = pipelineRuns.df(spark)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("pipeline", "measured_mbps")
      val training = pipelines.df(spark)
        .filter(col("kind") === "training" && col("required_mbps").isNotNull)
      val ok = training.join(latest, Seq("pipeline"))
        .filter(col("measured_mbps") >= col("required_mbps"))
      fractionDf(spark, "batch_throughput_sufficiency", cnt(ok), cnt(training))
    },
    Some {
      val latestCte =
        """latest AS (SELECT pipeline, measured_mbps FROM (
          |SELECT pipeline, measured_mbps,
          |ROW_NUMBER() OVER (PARTITION BY pipeline ORDER BY start_ts DESC) AS rn
          |FROM pipeline_runs) WHERE rn = 1)""".stripMargin.replace("\n", " ")
      fractionSql("batch_throughput_sufficiency",
        "SELECT COUNT(*) FROM pipelines p JOIN latest l ON p.pipeline = l.pipeline WHERE p.kind = 'training' AND p.required_mbps IS NOT NULL AND l.measured_mbps >= p.required_mbps",
        "SELECT COUNT(*) FROM pipelines WHERE kind = 'training' AND required_mbps IS NOT NULL",
        Seq(pipelines, pipelineRuns), Seq(latestCte))
    })

  /** #18 point_lookup_availability (yaml:78-80): records of key-addressable
    * stores whose key is non-null and unique. Grain = record.
    */
  val pointLookupAvailability = Check("point_lookup_availability",
    (spark, dir) => {
      val cust = table(spark, dir, "customer")
      val custOk = cust.filter(col("c_custkey").isNotNull)
        .groupBy("c_custkey").count().filter(col("count") === 1)
      val onf = onlineFeatures.df(spark)
      val onfOk = onf.groupBy("entity_id", "feature").count()
        .filter(col("count") === 1)
      val h = custOk.agg(count(lit(1)).as("a")).crossJoin(
        onfOk.agg(count(lit(1)).as("b"))).select((col("a") + col("b")).as("hits"))
      val p = cust.agg(count(lit(1)).as("a")).crossJoin(
        onf.agg(count(lit(1)).as("b"))).select((col("a") + col("b")).as("population"))
      fractionDf(spark, "point_lookup_availability", h, p)
    },
    Some(fractionSql("point_lookup_availability",
      "SELECT (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL GROUP BY c_custkey HAVING COUNT(*) = 1)) + (SELECT COUNT(*) FROM (SELECT entity_id, feature FROM online_features GROUP BY entity_id, feature HAVING COUNT(*) = 1))",
      "SELECT (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM online_features)",
      Seq(onlineFeatures))))

  /** #20 embedding_dimension_consistency (yaml:86-88): every collection
    * uniform-dim and matching the consuming model's dim.
    */
  val embeddingDimensionConsistency = Check("embedding_dimension_consistency",
    (spark, dir) => {
      val e = table(spark, dir, "embeddings")
        .agg(countDistinct(size(col("embedding"))).as("ndim"),
          max(size(col("embedding"))).as("dim"))
      val x = extraVectors.df(spark)
        .agg(countDistinct(size(col("embedding"))).as("ndim"),
          max(size(col("embedding"))).as("dim"))
      val colls = e.unionAll(x)
      fractionDf(spark, "embedding_dimension_consistency",
        cnt(colls.filter(col("ndim") === 1 && col("dim") === ModelDim)),
        cnt(colls))
    },
    Some(fractionSql("embedding_dimension_consistency",
      s"SELECT COUNT(*) FROM (SELECT COUNT(DISTINCT len(embedding)) AS ndim, MAX(len(embedding)) AS dim FROM embeddings UNION ALL SELECT COUNT(DISTINCT len(embedding)), MAX(len(embedding)) FROM extra_vectors) WHERE ndim = 1 AND dim = $ModelDim",
      "SELECT 2", // two collections by construction: embeddings + extra_vectors
      Seq(extraVectors))))

  val all: Seq[Check] = Seq(accessOptimization, searchOptimization,
    servingLatencyCompliance, embeddingCoverage,
    featureMaterializationCoverage, nativeFormatAvailability,
    vectorIndexCoverage, chunkReadiness, batchThroughputSufficiency,
    pointLookupAvailability, embeddingDimensionConsistency)
}
