package graft.substrate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** Dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared euclidean distance (avoid the sqrt when only ranking). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
}
