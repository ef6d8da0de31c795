package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Fused cosine similarity over two float-array columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The portable formulation (aggregate ∘ zip_with, see
  * graft.functions.VectorFunctions.cosine) materializes an
  * intermediate array per row-pair and walks both vectors three times
  * (dot, |a|, |b|). This expression does one allocation-free pass,
  * accumulating dot/|a|²/|b|² together — the §7-Step-6 performance
  * upgrade behind identical semantics.
  *
  * Numeric contract: identical operation order to the fold version
  * (left-to-right, double accumulation), so results are bit-identical
  * and the DuckDB oracles are unchanged.
  *
  * Null contract (matches the declarative form exactly, so the
  * RewriteCosineToNative substitution is semantics-preserving):
  * mismatched lengths → null (zip_with null-pads → null product →
  * null fold), any null element → null (null propagates through the
  * fold), zero norm (incl. both-empty) → null (the declarative form's
  * nullif divisor guard — required under Spark 4's default ANSI mode,
  * where an unguarded Divide by 0.0 would throw).
  */
case class CosineSimilarity(left: Expression, right: Expression)
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

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val anyNull = ctx.freshName("anyNull")
      val denom = ctx.freshName("denom")
      // nullSafeCodeGen sets ev.isNull=false before this block; start
      // from true and only clear it on a fully-defined result.
      s"""
        ${ev.isNull} = true;
        final int $n = $a.numElements();
        if ($n == $b.numElements()) {
          double $dot = 0.0;
          double $nx = 0.0;
          double $ny = 0.0;
          boolean $anyNull = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
            final double $xv = (double) $a.getFloat($i);
            final double $yv = (double) $b.getFloat($i);
            $dot += $xv * $yv;
            $nx += $xv * $xv;
            $ny += $yv * $yv;
          }
          final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
          if (!$anyNull && $denom != 0.0) {
            ${ev.isNull} = false;
            ${ev.value} = $dot / $denom;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "cosine_sim"

  val identifier: FunctionIdentifier = FunctionIdentifier(name)

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$name expects 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Idempotent per-session registration (for sessions not built with
    * GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(identifier, info, builder)
}
