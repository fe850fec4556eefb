package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Why custom expressions (SURVEY.md §4 reserved this option): the
  * `aggregate(zip_with(...))` formulation is correct but higher-order
  * functions are interpreted per-row — they never enter whole-stage
  * codegen, and all-pairs similarity executes the fold N² times. These
  * compile to a tight primitive loop inside the generated code
  * (measured ~3-5x on the all-pairs similarity bench at sf0.1).
  *
  * Accumulation is a sequential left-to-right sum — the SAME order as the
  * HOF fold and DuckDB's list arithmetic, so oracle parity is preserved to
  * the ulp.
  */
abstract class ArrayPairFold extends BinaryExpression {
  // inputs are always array<double> by construction (substrate.VectorOps
  // widens first); AbstractDataType is private[sql], so no ExpectsInputTypes
  override def dataType: DataType = DoubleType
  // null on null input OR mismatched lengths (a truncated fold would be a
  // plausible-but-wrong similarity with no failure signal)
  override def nullable: Boolean = true

  protected def combine(x: Double, y: Double): Double
  /** Java source for one element's contribution, in terms of `x`/`y`. */
  protected def combineCode(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += combine(x.getDouble(i), y.getDouble(i)); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${combineCode(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ */
case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_array_dot"
}

/** Σ (aᵢ−bᵢ)² */
case class ArraySqDist(left: Expression, right: Expression) extends ArrayPairFold {
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_array_sqdist"
}

/** Full PQ encode of one vector — codes(s) = index of the nearest
  * `cb(s)` centroid of subvector s (ties → smallest index, matching the
  * SQL `array_position(ds, array_min(ds))` convention and the DuckDB
  * oracle's (distance, cid) row_number tie-break).
  *
  * Why a native expression (the ArrayPairFold rationale at production
  * codebook size): the HOF formulation — transform over an m·k
  * nested-literal matrix with an ArraySqDist lambda — evaluates m·k
  * interpreted lambda calls per ROW; at k=256 that is ~4M interpreted
  * evals per 2000-row encode, profiled at ~15 s. This loop is the same
  * arithmetic as straight-line JVM double ops (~16k flops/row → ms), the
  * codebook rides along ONCE as expression metadata (not as 16k literal
  * plan nodes — Catalyst tree passes priced those too), and the encode
  * projection stays exchange-free. CodegenFallback costs one virtual
  * call per row — irrelevant next to the inner loop.
  */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = cb.length
    val sd = arr.numElements() / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var d = 0.0
        var j = 0
        while (j < sd) {
          val x = arr.getDouble(s * sd + j) - cv(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_pq_encode"
}
