package graft.checks

import org.apache.spark.sql.functions._

import graft.checks.CheckDsl._
import graft.substrate.TextOps.tokens
import graft.substrate.VectorOps.toDoubleArr

/** Drift-monitoring tier (substrate.Drift): population-level comparison
  * of two corpus snapshots — the pre-retrain gate beside Factor 3's
  * value-freshness checks. Snapshots here are the deterministic
  * even/odd doc_id halves (the in-corpus stand-in for "last month's
  * corpus vs this month's" — both engines derive the same split).
  */
object DriftTier {

  /** Token-distribution PSI between the even and odd halves of the
    * document corpus — per-token contributions (Laplace-smoothed over
    * the union vocabulary), ordered by token so the movers are visible.
    * The oracle reproduces counts, smoothing, and the (p_cur−p_ref)·
    * ln(p_cur/p_ref) term per token; counts are integers, so the only
    * float arithmetic is the final smoothed-probability expression —
    * engine-exact to well within the 1e-9 comparator.
    */
  val corpusDriftPsi = Check("corpus_drift_psi",
    (spark, dir) => {
      val d = table(spark, dir, "documents")
      def half(m: Int) = d.filter(col("doc_id") % 2 === m)
        .select(explode(tokens(col("text"))).as("token"))
      graft.substrate.Drift.categoricalPsi(half(0), half(1), "token")
        .withColumnRenamed("key", "token")
        .orderBy("token")
    },
    Some(
      """WITH rtoks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |FROM documents WHERE doc_id % 2 = 0),
        |ctoks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |FROM documents WHERE doc_id % 2 = 1),
        |rc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_ref FROM rtoks GROUP BY 1),
        |cc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_cur FROM ctoks GROUP BY 1),
        |unioned AS (SELECT token, COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |FROM rc FULL JOIN cc USING (token)),
        |tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur, COUNT(*) AS v FROM unioned)
        |SELECT token, n_ref, n_cur,
        |(n_ref + 1.0) / (t_ref + v) AS p_ref,
        |(n_cur + 1.0) / (t_cur + v) AS p_cur,
        |((n_cur + 1.0) / (t_cur + v) - (n_ref + 1.0) / (t_ref + v))
        |* ln(((n_cur + 1.0) / (t_cur + v)) / ((n_ref + 1.0) / (t_ref + v))) AS contrib
        |FROM unioned, tot ORDER BY token"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** Per-dimension embedding mean shift between the even and odd vec_id
    * halves — the representation-space drift monitor. Means are averages
    * of float32 values cast to double; summation order differs between
    * engines at ~1e-16 relative, far under the comparator's 1e-9.
    */
  val embeddingDriftMeans = Check("embedding_drift_means",
    (spark, dir) => {
      val e = table(spark, dir, "embeddings")
        .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      def half(m: Int) = e.filter(col("vec_id") % 2 === m)
      graft.substrate.Drift.embeddingMeanShift(half(0), half(1), "v")
        .orderBy("dim")
    },
    Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |r AS (SELECT CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim, unnest(v) AS x
        |FROM e WHERE vec_id % 2 = 0),
        |c AS (SELECT CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim, unnest(v) AS x
        |FROM e WHERE vec_id % 2 = 1),
        |rm AS (SELECT dim, AVG(x) AS mean_ref FROM r GROUP BY dim),
        |cm AS (SELECT dim, AVG(x) AS mean_cur FROM c GROUP BY dim)
        |SELECT dim, mean_ref, mean_cur, abs(mean_cur - mean_ref) AS abs_shift
        |FROM rm JOIN cm USING (dim) ORDER BY dim"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** Binned numeric-value PSI between the even and odd event_id halves
    * of the events stream (Drift.numericPsi): decile edges from the
    * deterministic event_id % 20 sample of the reference half (exact
    * rank-selected elements, (v, event_id) tie-break), both halves
    * histogrammed against those fixed edges, Laplace-smoothed PSI per
    * bin. The oracle re-derives the sample, the rank-selected edges,
    * the edges-below-v bin fold, and the smoothing arithmetic — counts
    * are integers, so cross-engine float noise enters only the final
    * probability expressions.
    */
  val numericDriftPsi = Check("numeric_drift_psi",
    (spark, dir) => {
      val ev = table(spark, dir, "events").select(col("event_id"), col("value"))
      def half(m: Int) = ev.filter(col("event_id") % 2 === m)
      graft.substrate.Drift.numericPsi(half(0), half(1), "value", "event_id")
        .withColumnRenamed("key", "bin")
        .orderBy("bin")
    },
    Some(
      """WITH samp AS (SELECT value AS v, event_id AS tie FROM events
        |WHERE event_id % 2 = 0 AND event_id % 20 = 0),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM samp),
        |r AS (SELECT v, CAST(row_number() OVER (ORDER BY v, tie) AS BIGINT) AS rn FROM samp),
        |edges AS (SELECT v AS edge FROM r, n,
        |(SELECT unnest(generate_series(1, 9)) AS k)
        |WHERE rn = CAST(ceil(n * k / 10.0) AS BIGINT)),
        |rb AS (SELECT (SELECT COUNT(*) FROM edges e WHERE ev.value > e.edge) AS bin
        |FROM events ev WHERE ev.event_id % 2 = 0),
        |cb AS (SELECT (SELECT COUNT(*) FROM edges e WHERE ev.value > e.edge) AS bin
        |FROM events ev WHERE ev.event_id % 2 = 1),
        |rc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_ref FROM rb GROUP BY 1),
        |cc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_cur FROM cb GROUP BY 1),
        |unioned AS (SELECT bin, COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |FROM rc FULL JOIN cc USING (bin)),
        |tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur, COUNT(*) AS v FROM unioned)
        |SELECT bin, n_ref, n_cur,
        |(n_ref + 1.0) / (t_ref + v) AS p_ref,
        |(n_cur + 1.0) / (t_cur + v) AS p_cur,
        |((n_cur + 1.0) / (t_cur + v) - (n_ref + 1.0) / (t_ref + v))
        |* ln(((n_cur + 1.0) / (t_cur + v)) / ((n_ref + 1.0) / (t_ref + v))) AS contrib
        |FROM unioned, tot ORDER BY bin"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  val all: Seq[Check] = Seq(corpusDriftPsi, embeddingDriftMeans,
    numericDriftPsi)
}
