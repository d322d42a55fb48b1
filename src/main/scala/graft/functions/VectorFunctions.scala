package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) scalar functions — reference
  * common/function/src/scalars/vector (18 functions, SURVEY.md §2.8).
  *
  * Vectors are `ArrayType(FloatType)` columns. Everything here composes
  * Spark's codegen'd higher-order functions (`transform`, `zip_with`,
  * `aggregate`) — no UDF, so whole-stage codegen stays intact on the
  * 100 TB hot path. Math is done in double precision like the reference
  * (f32 storage, f64 compute).
  */
object VectorFunctions {

  /** parse_vec('[1.0,2.0]') -> array<float> */
  def parseVec(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))

  /** vec_to_string(v) -> '[1.0,2.0]' */
  def vecToString(c: Column): Column = to_json(c)

  def vecDim(c: Column): Column = size(c)

  private def d(x: Column): Column = x.cast("double")

  /** Σ f(xi) with double accumulator. */
  private def fold(c: Column, f: Column => Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + f(x))

  def vecElemSum(c: Column): Column = fold(c, d)
  def vecElemAvg(c: Column): Column = fold(c, d) / size(c)
  def vecElemProduct(c: Column): Column =
    aggregate(c, lit(1.0), (acc, x) => acc * d(x))

  def vecNorm(c: Column): Column = sqrt(fold(c, x => d(x) * d(x)))

  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecMul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)
  def vecDiv(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x / y)

  def vecScalarAdd(s: Column, v: Column): Column = transform(v, x => x + s)
  def vecScalarMul(s: Column, v: Column): Column = transform(v, x => x * s)

  /** 0-based element access (reference vec_kth_elem). */
  def vecKthElem(v: Column, k: Column): Column = element_at(v, k.cast("int") + 1)
  def vecKthElem(v: Column, k: Int): Column = vecKthElem(v, lit(k))

  /** [start, end) 0-based (reference vec_subvector). */
  def vecSubvector(v: Column, start: Column, end: Column): Column =
    slice(v, start.cast("int") + 1, (end - start).cast("int"))

  def vecDotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  def vecL2sqDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, x) => acc + x)

  /** cosine *distance* = 1 - cos similarity (reference vec_cos_distance). */
  def vecCosDistance(a: Column, b: Column): Column =
    lit(1.0) - vecDotProduct(a, b) / (vecNorm(a) * vecNorm(b))
}
