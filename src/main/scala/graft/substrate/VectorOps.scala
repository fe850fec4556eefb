package graft.substrate

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayDotProduct, ArraySqDist}

/** Vector arithmetic over `ArrayType` embedding columns, built entirely from
  * codegen'd Catalyst higher-order functions (`zip_with` + `aggregate`) — no
  * UDFs, so the whole kNN pipeline stays inside whole-stage codegen
  * (SURVEY.md §2.B "UDF surface: none required").
  *
  * All math in DOUBLE: parquet float32 → double widening is exact, and the
  * sequential left-fold accumulation order matches DuckDB's
  * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` to ~1 ulp — measured
  * 3e-17 absolute, vs top-k boundary margins of ~1e-3 on the testdata, so
  * rank outputs are engine-portable.
  */
object VectorOps {

  /** Cast an array<float> column to array<double> element-wise. */
  def toDoubleArr(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product of two array<double> columns — native codegen'd
    * expression (see functions.ArrayDotProduct for why not
    * aggregate+zip_with).
    */
  def dot(a: Column, b: Column): Column =
    GraftColumn.of(ArrayDotProduct(
      GraftColumn.expressionOf(a), GraftColumn.expressionOf(b)))

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared euclidean distance (avoid the sqrt when only ranking). */
  def sqDist(a: Column, b: Column): Column =
    GraftColumn.of(ArraySqDist(
      GraftColumn.expressionOf(a), GraftColumn.expressionOf(b)))

  /** Pairwise-cosine at scale: do NOT call `cosine` inside an all-pairs
    * join — higher-order array folds don't enter whole-stage codegen, so
    * three folds per pair (dot + two norms) dominate. Instead project
    * `l2norm` as a scalar column on each side BEFORE the join (computed N
    * times, carried through the join as a plain double) and compute
    * `dot(va, vb) / (na * nb)` per pair — one fold instead of three
    * (measured ~3x on the all-pairs bench). Per-element normalization via
    * `transform(a, x => x / l2norm(a))` is WORSE: Catalyst collapses
    * projects and re-evaluates the loop-invariant norm fold per ELEMENT.
    */
  def cosineFromParts(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
