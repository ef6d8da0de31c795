package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built
  * entirely from codegen'd higher-order functions — no UDFs, so the
  * expressions stay inside WholeStageCodegen and are usable in any
  * filter/join/window position at 100 TB scale.
  *
  * Numerical contract: accumulate in double, left-to-right fold —
  * byte-identical to DuckDB's list_dot_product / list_sum over
  * list_transform (verified empirically), which keeps cosine scores
  * oracle-comparable.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass cosine via the native codegen expression
    * (bit-identical to [[cosine]]; see expressions.CosineSimilarity).
    * Requires CosineSimilarity.register(spark) or GraftExtensions.
    */
  def cosineFast(a: Column, b: Column): Column =
    call_function(graft.functions.expressions.CosineSimilarity.name, a, b)

  /** Squared L2 distance. */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dlt = x.cast("double") - y.cast("double")
        dlt * dlt
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Squared(a, b))
}
