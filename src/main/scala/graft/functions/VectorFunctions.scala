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

  /** Cosine similarity = dot / (|a|·|b|), null when either norm is
    * zero. The zero guard matters under Spark 4's default ANSI mode,
    * where a bare Divide by 0.0 throws instead of returning null; with
    * the guard the divisor becomes NULL and division yields null in
    * both ANSI and legacy modes — the same contract as the fused
    * expressions.CosineSimilarity (so RewriteCosineToNative stays
    * semantics-preserving). `when` rather than `nullif`: nullif's
    * common-expression hoisting would split the divisor across
    * projections and defeat the rewrite rule's pattern match.
    */
  def cosine(a: Column, b: Column): Column = {
    val normProduct = norm(a) * norm(b)
    dot(a, b) / when(normProduct =!= lit(0.0), normProduct)
  }

  /** Fused single-pass cosine via the native codegen expression
    * (bit-identical to [[cosine]]; see expressions.CosineSimilarity).
    * Requires CosineSimilarity.register(spark) or GraftExtensions.
    */
  def cosineFast(a: Column, b: Column): Column =
    call_function(graft.functions.expressions.CosineSimilarity.name, a, b)

  /** Fused single-pass dot product (bit-identical to [[dot]]; see
    * expressions.DotProduct). Requires DotProduct.register(spark) or
    * GraftExtensions.
    */
  def dotFast(a: Column, b: Column): Column =
    call_function(graft.functions.expressions.DotProduct.name, a, b)

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
