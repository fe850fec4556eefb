package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public Column
  * API (Spark 4 hides Expression↔Column conversion behind
  * `private[sql] classic.ExpressionUtils`; this shim is the standard
  * extension-library access pattern — no Spark internals are modified).
  */
object GraftColumn {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's SQL functions on an ALREADY-RUNNING session (the
    * SparkSessionExtensions path only applies at session construction).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_array_dot",
      es => graft.functions.ArrayDotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_array_sqdist",
      es => graft.functions.ArraySqDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      es => graft.functions.WordShingles(es(0),
        graft.GraftExtensions.intArg(es, 1)), "built-in")
  }
}
