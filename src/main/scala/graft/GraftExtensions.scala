package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, ArraySqDist, WordShingles}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_array_dot(a,b)")`
  * works for SQL-surface users (and the functions resolve on any session
  * built with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(clazz: Class[_], name: String, usage: String) =
      new ExpressionInfo(clazz.getName, null, name, usage,
        "", "", "", "", "", "", "scala_udf")

    ext.injectFunction((FunctionIdentifier("graft_array_dot"),
      info(classOf[ArrayDotProduct], "graft_array_dot",
        "dot product of two array<double>"),
      (es: Seq[Expression]) => ArrayDotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_array_sqdist"),
      info(classOf[ArraySqDist], "graft_array_sqdist",
        "squared euclidean distance of two array<double>"),
      (es: Seq[Expression]) => ArraySqDist(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_word_shingles"),
      info(classOf[WordShingles], "graft_word_shingles",
        "distinct word n-gram shingles of a token array"),
      (es: Seq[Expression]) => WordShingles(es(0), GraftExtensions.intArg(es, 1))))
  }
}

object GraftExtensions {
  /** Extract a foldable integral literal argument with a clear error (an
    * unguarded `eval().asInstanceOf[Int]` fails confusingly on 3L or a
    * column reference).
    */
  def intArg(es: Seq[Expression], i: Int): Int = {
    val e = es(i)
    require(e.foldable,
      s"argument ${i + 1} must be a literal integer, got ${e.sql}")
    e.eval() match {
      case n: Int  => n
      case n: Long => Math.toIntExact(n) // throws on overflow, never wraps
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }
  }
}
