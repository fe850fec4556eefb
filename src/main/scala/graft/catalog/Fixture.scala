package graft.catalog

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** A tiny metadata-catalog table (SURVEY.md §5.5 / FIXTURES.md §B) with ONE
  * source of truth rendered two ways:
  *   - `df(spark)`  → an in-memory Spark DataFrame (broadcast-size by design;
  *     at 100 TB these catalogs live in a metastore and stay metadata-small,
  *     so every join against them is a broadcast join)
  *   - `cte`        → a DuckDB `name AS (SELECT CAST.. FROM (VALUES ..))`
  *     common-table-expression embedded in the oracle SQL, so the DuckDB
  *     oracle sees byte-identical fixture data.
  *
  * Every column is explicitly CAST in the CTE: DuckDB would otherwise infer
  * `1.5` as DECIMAL(2,1) (decimal arithmetic != double arithmetic) and small
  * ints as INTEGER (!= Spark LongType) — either breaks the driver's
  * schema/hash compare.
  */
final case class Fixture(name: String, schema: StructType, rows: Seq[Seq[Any]]) {

  def df(spark: SparkSession): DataFrame = {
    // LocalRelation path (NOT sparkContext.parallelize): the rows embed in
    // the logical plan, so joins against catalogs broadcast without
    // launching a job each — the assessment scorecard alone carries ~60
    // such broadcasts.
    import scala.jdk.CollectionConverters._
    val rs: java.util.List[Row] = rows.map(r => Row.fromSeq(r)).asJava
    spark.createDataFrame(rs, schema)
  }

  private def duckType(dt: DataType): String = dt match {
    case LongType            => "BIGINT"
    case IntegerType         => "INTEGER"
    case DoubleType          => "DOUBLE"
    case FloatType           => "REAL"
    case StringType          => "VARCHAR"
    case BooleanType         => "BOOLEAN"
    case TimestampType       => "TIMESTAMP"
    case ArrayType(e, _)     => duckType(e) + "[]"
    case other => sys.error(s"no duck type mapping for $other")
  }

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  private def lit(v: Any): String = v match {
    case null          => "NULL"
    case s: String     => "'" + s.replace("'", "''") + "'"
    case i: Instant    => "TIMESTAMP '" + tsFmt.format(i) + "'"
    case b: Boolean    => if (b) "TRUE" else "FALSE"
    case d: Double     => if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
    case f: Float      => if (f.isWhole && math.abs(f) < 1e15) s"${f.toLong}.0" else f.toString
    case n @ (_: Long | _: Int) => n.toString
    case xs: Seq[_]    => xs.map(lit).mkString("[", ", ", "]")
    case other => sys.error(s"no duck literal for $other (${other.getClass})")
  }

  /** `name AS (SELECT CAST(v1 AS T1) AS c1, ... FROM (VALUES ...) v(...))` */
  def cte: String = {
    val colNames = schema.fields.map(_.name)
    val casts = schema.fields
      .map(f => s"CAST(${f.name} AS ${duckType(f.dataType)}) AS ${f.name}")
      .mkString(", ")
    val values = rows.map(_.map(lit).mkString("(", ", ", ")")).mkString(", ")
    s"$name AS (SELECT $casts FROM (VALUES $values) v(${colNames.mkString(", ")}))"
  }
}

object Fixture {
  /** Compose the oracle SQL: all fixture CTEs + optional extra CTEs + body.
    * Data tables (`lineitem`, `events`, ...) are referenced by bare name —
    * the driver registers them as DuckDB views over the same parquet files.
    */
  def oracle(fixtures: Seq[Fixture], body: String, extraCtes: Seq[String] = Nil): String = {
    val ctes = fixtures.map(_.cte) ++ extraCtes
    if (ctes.isEmpty) body
    // RECURSIVE is harmless for plain CTEs and required by the lineage
    // closure oracles (DuckDB follows the SQL standard here).
    else "WITH RECURSIVE " + ctes.mkString(", ") + " " + body
  }
}
