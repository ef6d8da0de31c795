package graft.plans

import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §4 "custom work" tier): recognize the
  * portable cosine-similarity shape
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / nullif(sqrt(dot(a,a)) * sqrt(dot(b,b)), 0.0)
  *
  * (the guarded divisor is what VectorFunctions.cosine builds; a bare
  * unguarded divisor is also matched, but only in legacy non-ANSI
  * sessions where Divide-by-zero already yields null — under ANSI the
  * bare form throws, which the fused expression does not replicate)
  *
  * (what graft.functions.VectorFunctions.cosine builds, and what a
  * user writing plain declarative SQL would produce) and replace it
  * with the fused, allocation-free codegen expression
  * CosineSimilarity. Semantics are identical: same operation order
  * (bit-identical values) AND same null behavior (mismatched lengths,
  * null elements, and zero norms all yield null in both forms — see
  * CosineSimilarity's null contract). The rewrite only fires on
  * array<float> inputs: optimizer rules run post-analysis, so
  * checkInputDataTypes is never re-run, and an unguarded match on
  * e.g. array<int> would reinterpret int bits via getFloat.
  *
  * Injected by GraftExtensions (or
  * `spark.experimental.extraOptimizations`).
  */
object RewriteCosineToNative extends Rule[LogicalPlan] {

  /** Matches the fold-based dot product over two float arrays cast to
    * double; yields the two array expressions.
    */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(
              Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, finArgs, _))
          if finArgs.exists(_.exprId == fin.exprId) =>
        val _ = (x, y, acc, v) // shape-only binding
        Some((a, b))
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Matches the norm product sqrt(dot(a,a)) * sqrt(dot(b,b)). */
  private object NormProduct {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression)] =
      e match {
        case Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _) =>
          Some((a2, a3, b2, b3))
        case _ => None
      }
  }

  /** Matches the zero-guarded divisor VectorFunctions.cosine builds:
    * CASE WHEN normProduct != 0.0 THEN normProduct END (no else →
    * null), plus the equivalent If/nullif expansions.
    */
  private object GuardedNormProduct {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression)] = {
      val inner = e match {
        case CaseWhen(Seq((Not(EqualTo(x, Literal(0.0, DoubleType))), y)), None)
            if x.semanticEquals(y) => Some(y)
        case If(Not(EqualTo(x, Literal(0.0, DoubleType))), y, Literal(null, _))
            if x.semanticEquals(y) => Some(y)
        case If(EqualTo(x, Literal(0.0, DoubleType)), Literal(null, _), y)
            if x.semanticEquals(y) => Some(y)
        case _ => None
      }
      inner.flatMap(NormProduct.unapply)
    }
  }

  private def sameVectors(a: Expression, b: Expression,
      parts: (Expression, Expression, Expression, Expression)): Boolean = {
    val (a2, a3, b2, b3) = parts
    a.semanticEquals(a2) && a.semanticEquals(a3) &&
      b.semanticEquals(b2) && b.semanticEquals(b3) &&
      isFloatArray(a) && isFloatArray(b)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotFold(a, b), GuardedNormProduct(parts), _)
          if sameVectors(a, b, parts) =>
        CosineSimilarity(a, b)
      // bare divisor: null-on-zero only holds outside ANSI mode
      case Divide(DotFold(a, b), NormProduct(parts), _)
          if !conf.ansiEnabled && sameVectors(a, b, parts) =>
        CosineSimilarity(a, b)
    }
}
