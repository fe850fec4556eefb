package graft.checks

import org.apache.spark.sql.functions._

import graft.catalog.Fixtures._
import graft.checks.CheckDsl._

/** Factor 1 — Contextual: "Meaning is explicit and colocated with the data"
  * (reference `factors/1-contextual.md:3`; requirement stanzas
  * `factors/requirements.yaml:8-39`). Checks #1-#8 of SURVEY.md §2.A.
  *
  * All eight are metadata-coverage fractions over the asset/column catalogs
  * — broadcast-size inputs, no shuffle of fact data at any scale.
  */
object Factor1 {

  private val docCond = "description IS NOT NULL AND length(trim(description)) > 0"

  /** #1 semantic_documentation (yaml:9-11): objects = tables ∪ columns. */
  val semanticDocumentation = Check("semantic_documentation",
    (spark, _) => {
      val a = assets.df(spark).select(col("description"))
      val c = columns.df(spark).select(col("description"))
      val objects = a.unionAll(c)
      fractionDf(spark, "semantic_documentation",
        cnt(objects.filter(expr(docCond))), cnt(objects))
    },
    Some(fractionSql("semantic_documentation",
      s"SELECT COUNT(*) FROM (SELECT description FROM assets UNION ALL SELECT description FROM columns) WHERE $docCond",
      "SELECT (SELECT COUNT(*) FROM assets) + (SELECT COUNT(*) FROM columns)",
      Seq(assets, columns))))

  /** #2 relationship_declaration (yaml:13-15). Candidate cross-entity
    * references are discovered structurally: a column whose de-prefixed stem
    * (`l_orderkey` → `orderkey`) matches another asset's declared key stem is
    * a candidate FK; score = declared / candidates.
    */
  val relationshipDeclaration = Check("relationship_declaration",
    (spark, _) => {
      val cols = columns.df(spark)
        .select(col("asset"), col("column_name"),
          regexp_replace(col("column_name"), "^[a-z]+_", "").as("stem"))
        .filter(col("stem").endsWith("key"))
      val keys = keyDeclarations.df(spark)
        .select(col("asset").as("dst_asset"), col("key_column").as("dst_column"),
          regexp_replace(col("key_column"), "^[a-z]+_", "").as("kstem"))
      val candidates = cols
        .join(broadcast(keys), cols("stem") === keys("kstem") &&
          cols("asset") =!= keys("dst_asset"))
        .select(col("asset").as("src_asset"), col("column_name").as("src_column"),
          col("dst_asset"), col("dst_column"))
      val declared = candidates.join(broadcast(relationships.df(spark)),
        Seq("src_asset", "src_column", "dst_asset", "dst_column"), "left_semi")
      fractionDf(spark, "relationship_declaration", cnt(declared), cnt(candidates))
    },
    Some {
      val candSql =
        """SELECT c.asset AS src_asset, c.column_name AS src_column,
          |k.asset AS dst_asset, k.key_column AS dst_column
          |FROM columns c JOIN key_declarations k
          |ON regexp_replace(c.column_name, '^[a-z]+_', '') =
          |   regexp_replace(k.key_column, '^[a-z]+_', '')
          |AND c.asset <> k.asset
          |WHERE regexp_replace(c.column_name, '^[a-z]+_', '') LIKE '%key'"""
          .stripMargin.replace("\n", " ")
      fractionSql("relationship_declaration",
        s"SELECT COUNT(*) FROM ($candSql) cand WHERE EXISTS (SELECT 1 FROM relationships r WHERE r.src_asset = cand.src_asset AND r.src_column = cand.src_column AND r.dst_asset = cand.dst_asset AND r.dst_column = cand.dst_column)",
        s"SELECT COUNT(*) FROM ($candSql) cand",
        Seq(columns, keyDeclarations, relationships))
    })

  /** #3 entity_identifier_declaration (yaml:17-19). */
  val entityIdentifierDeclaration = Check("entity_identifier_declaration",
    (spark, _) => {
      val a = assets.df(spark)
      val withKey = a.join(broadcast(keyDeclarations.df(spark)), Seq("asset"), "left_semi")
      fractionDf(spark, "entity_identifier_declaration", cnt(withKey), cnt(a))
    },
    Some(fractionSql("entity_identifier_declaration",
      "SELECT COUNT(*) FROM assets a WHERE EXISTS (SELECT 1 FROM key_declarations k WHERE k.asset = a.asset)",
      "SELECT COUNT(*) FROM assets",
      Seq(assets, keyDeclarations))))

  /** #4 temporal_scope_declaration (yaml:21-23): declared valid-time window. */
  val temporalScopeDeclaration = Check("temporal_scope_declaration",
    (spark, _) => {
      val a = assets.df(spark)
      fractionDf(spark, "temporal_scope_declaration",
        cnt(a.filter(col("valid_from").isNotNull)), cnt(a))
    },
    Some(fractionSql("temporal_scope_declaration",
      "SELECT COUNT(*) FROM assets WHERE valid_from IS NOT NULL",
      "SELECT COUNT(*) FROM assets", Seq(assets))))

  /** #5 schema_type_coverage (yaml:25-27). */
  val schemaTypeCoverage = Check("schema_type_coverage",
    (spark, _) => {
      val c = columns.df(spark)
      fractionDf(spark, "schema_type_coverage",
        cnt(c.filter(col("declared"))), cnt(c))
    },
    Some(fractionSql("schema_type_coverage",
      "SELECT COUNT(*) FROM columns WHERE declared",
      "SELECT COUNT(*) FROM columns", Seq(columns))))

  /** #6 business_glossary_linkage (yaml:29-31): link must RESOLVE (dangling
    * term ids don't count).
    */
  val businessGlossaryLinkage = Check("business_glossary_linkage",
    (spark, _) => {
      val c = columns.df(spark)
      val g = glossary.df(spark)
      val linked = c.join(broadcast(g),
        c("glossary_term_id") === g("term_id"), "left_semi")
      fractionDf(spark, "business_glossary_linkage", cnt(linked), cnt(c))
    },
    Some(fractionSql("business_glossary_linkage",
      "SELECT COUNT(*) FROM columns c WHERE EXISTS (SELECT 1 FROM glossary g WHERE g.term_id = c.glossary_term_id)",
      "SELECT COUNT(*) FROM columns", Seq(columns, glossary))))

  /** #7 constraint_declaration (yaml:33-35): fields with ≥1 declared
    * constraint. (Constraint *validation* against data is the
    * `constraint_validation` extension query.)
    */
  val constraintDeclaration = Check("constraint_declaration",
    (spark, _) => {
      val c = columns.df(spark)
      val constrained = c.join(broadcast(constraints.df(spark)),
        Seq("asset", "column_name"), "left_semi")
      fractionDf(spark, "constraint_declaration", cnt(constrained), cnt(c))
    },
    Some(fractionSql("constraint_declaration",
      "SELECT COUNT(*) FROM columns c WHERE EXISTS (SELECT 1 FROM constraints x WHERE x.asset = c.asset AND x.column_name = c.column_name)",
      "SELECT COUNT(*) FROM columns", Seq(columns, constraints))))

  /** #8 unit_of_measure_declaration (yaml:37-39): population = numeric
    * measure fields.
    */
  val unitOfMeasureDeclaration = Check("unit_of_measure_declaration",
    (spark, _) => {
      val nums = columns.df(spark).filter(col("is_numeric"))
      fractionDf(spark, "unit_of_measure_declaration",
        cnt(nums.filter(col("unit").isNotNull)), cnt(nums))
    },
    Some(fractionSql("unit_of_measure_declaration",
      "SELECT COUNT(*) FROM columns WHERE is_numeric AND unit IS NOT NULL",
      "SELECT COUNT(*) FROM columns WHERE is_numeric", Seq(columns))))

  val all: Seq[Check] = Seq(semanticDocumentation, relationshipDeclaration,
    entityIdentifierDeclaration, temporalScopeDeclaration, schemaTypeCoverage,
    businessGlossaryLinkage, constraintDeclaration, unitOfMeasureDeclaration)
}
