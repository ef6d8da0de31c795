package graft.plans

import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY.md §4 "custom work" tier): recognize the
  * portable cosine-similarity shape
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
  *
  * (what graft.functions.VectorFunctions.cosine builds, and what a
  * user writing plain declarative SQL would produce) and replace it
  * with the fused, allocation-free codegen expression
  * CosineSimilarity. Semantics are bit-identical (same operation
  * order), so this is a pure physical-cost rewrite — the engine
  * optimizes the declarative form automatically instead of asking
  * users to call a special function.
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotFold(a, b),
            Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3)
            && b.semanticEquals(b2) && b.semanticEquals(b3) =>
        CosineSimilarity(a, b)
    }
}
