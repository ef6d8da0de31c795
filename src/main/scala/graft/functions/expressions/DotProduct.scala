package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Fused dot product over two float-array columns — the allocation-free
  * codegen sibling of CosineSimilarity for places that need the raw
  * dot (LSH hyperplane side tests, IVF scoring): the portable
  * aggregate∘zip_with form materializes an intermediate array per row
  * pair, this is one pass with no allocation.
  *
  * Numeric contract: left-to-right double accumulation — bit-identical
  * to VectorFunctions.dot (and DuckDB list_dot_product), so oracle SQL
  * is unchanged when substituted.
  *
  * Null contract (matches the declarative form): mismatched lengths →
  * null (zip_with null-pads → null product → null fold), any null
  * element → null, null array → null. An empty pair yields 0.0, same
  * as folding an empty array.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      // nullSafeCodeGen sets ev.isNull=false before this block; start
      // from true and only clear it on a fully-defined result.
      s"""
        ${ev.isNull} = true;
        final int $n = $a.numElements();
        if ($n == $b.numElements()) {
          double $dot = 0.0;
          boolean $anyNull = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
            $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          if (!$anyNull) {
            ${ev.isNull} = false;
            ${ev.value} = $dot;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val name = "dot_product"

  val identifier: FunctionIdentifier = FunctionIdentifier(name)

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$name expects 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Idempotent per-session registration (for sessions not built with
    * GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(identifier, info, builder)
}
