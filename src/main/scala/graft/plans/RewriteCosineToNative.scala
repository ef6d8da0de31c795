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
  *     / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotFold(a, b),
            Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3)
            && b.semanticEquals(b2) && b.semanticEquals(b3)
            && isFloatArray(a) && isFloatArray(b) =>
        CosineSimilarity(a, b)
    }
}
