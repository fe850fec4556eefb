package graft.checks

import org.apache.spark.sql.functions._

import graft.catalog.Fixtures
import graft.catalog.Fixtures.{constraints, featureValues, labels}
import graft.checks.CheckDsl._
import graft.substrate.AsOfJoin

/** Relational extension operators named by SURVEY.md §2.B: the as-of join,
  * constraint validation over real data, and JSON-props parsing.
  */
object OpsTier {

  /** The as-of join operator itself (what check #24 scores the need for):
    * labels enriched with the latest feature at-or-before each label
    * timestamp. Oracle = DuckDB's native ASOF LEFT JOIN — an independent
    * implementation validating our union+window formulation.
    */
  val asofJoin = Check("asof_join",
    (spark, _) => {
      val l = labels.df(spark)
      val r = featureValues.df(spark).select("entity_id", "feature_ts", "value")
      AsOfJoin.asofLeft(l, r, key = "entity_id",
        leftTs = "label_ts", rightTs = "feature_ts", rightVals = Seq("value"))
        .orderBy("entity_id")
    },
    Some(graft.catalog.Fixture.oracle(Seq(labels, featureValues),
      """SELECT l.entity_id, l.label_ts, l.label,
        |f.feature_ts AS asof_feature_ts, f.value
        |FROM labels l ASOF LEFT JOIN feature_values f
        |ON l.entity_id = f.entity_id AND f.feature_ts <= l.label_ts
        |ORDER BY l.entity_id""".stripMargin.replace("\n", " "))),
    isScore = false)

  /** Constraint VALIDATION (the data-probing half of check #7): per
    * declared constraint, the violation rate measured against the actual
    * table. Both the Spark plan and the oracle SQL are generated from the
    * same constraint catalog rows — one column-pruned scan per constraint,
    * each a partial-aggregated single pass.
    */
  val constraintValidation = Check("constraint_validation",
    (spark, dir) => {
      val probes = constraints.rows.map { r =>
        val Seq(asset, column, kind) = r.take(3).map(_.asInstanceOf[String])
        val t = table(spark, dir, asset)
        val c = col(column)
        val viol = kind match {
          case "not_null" => sum(when(c.isNull, 1L).otherwise(0L))
          case "unique"   => count(c) - countDistinct(c)
          case "range"    =>
            val lo = r(3).asInstanceOf[Double]; val hi = r(4).asInstanceOf[Double]
            sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
          case "pattern"  =>
            val pat = r(5).asInstanceOf[String]
            sum(when(c.isNotNull && !c.rlike(pat), 1L).otherwise(0L))
        }
        t.agg(coalesce(viol, lit(0L)).cast("long").as("violations"),
            count(lit(1)).as("total"))
          .select(lit(asset).as("asset"), lit(column).as("column_name"),
            lit(kind).as("kind"), col("violations"), col("total"),
            (col("violations").cast("double") / col("total")).as("violation_rate"))
      }
      probes.reduce(_ unionAll _).orderBy("asset", "column_name", "kind")
    },
    Some {
      val selects = constraints.rows.map { r =>
        val Seq(asset, column, kind) = r.take(3).map(_.asInstanceOf[String])
        val viol = kind match {
          case "not_null" => s"SUM(CASE WHEN $column IS NULL THEN 1 ELSE 0 END)"
          case "unique"   => s"COUNT($column) - COUNT(DISTINCT $column)"
          case "range"    =>
            val lo = r(3).asInstanceOf[Double]; val hi = r(4).asInstanceOf[Double]
            s"SUM(CASE WHEN $column IS NOT NULL AND ($column < $lo OR $column > $hi) THEN 1 ELSE 0 END)"
          case "pattern"  =>
            val pat = r(5).asInstanceOf[String]
            s"SUM(CASE WHEN $column IS NOT NULL AND NOT regexp_matches($column, '$pat') THEN 1 ELSE 0 END)"
        }
        s"""SELECT '$asset' AS asset, '$column' AS column_name, '$kind' AS kind,
           |CAST(COALESCE($viol, 0) AS BIGINT) AS violations,
           |CAST(COUNT(*) AS BIGINT) AS total,
           |CAST(COALESCE($viol, 0) AS DOUBLE) / COUNT(*) AS violation_rate
           |FROM $asset""".stripMargin.replace("\n", " ")
      }
      selects.mkString("", " UNION ALL ", " ORDER BY asset, column_name, kind")
    },
    isScore = false)

  /** Semi-structured props parsing (§2.B sources row: `from_json` /
    * `get_json_object` on `events.props`): extract the numeric payload and
    * aggregate per event type.
    */
  val eventsPropsStats = Check("events_props_stats",
    (spark, dir) => {
      table(spark, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          (sum("k").cast("double") / count(lit(1))).as("avg_k"))
        .orderBy("event_type")
    },
    Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  val all: Seq[Check] = Seq(asofJoin, constraintValidation, eventsPropsStats)
}
