package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.checks.Checks
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full assessment (every implemented check unioned).
    */
  def entry(spark: SparkSession): DataFrame =
    Checks.all.filter(_.isScore).map(_.run(spark, "/root/testdata/sf0.001"))
      .reduce(_ unionAll _)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Checks.all.map(c => c.name -> c.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Checks.all.flatMap(c => c.oracle.map(c.name -> _)).toMap
}
