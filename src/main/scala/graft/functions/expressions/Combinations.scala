package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Unordered-pair enumeration kernel (r18, VERDICT r17 item 6).
  *
  * The basket pair explosion in q_cross_sell used TWO chained
  * Generates: explode(parts) carrying the full `parts` array on every
  * exploded row (the array is COPIED per element), then a second
  * explode plus a `part1 < part2` filter that throws half the
  * generated rows away. One compiled kernel emits exactly the
  * C(n, 2) ordered pairs (x < y) of a distinct long array — one
  * Generate in the plan, no per-element array duplication, no
  * post-filter. Per-order arrays are a handful of elements (an order
  * has a bounded number of lines at any corpus size), so the pair
  * array is tiny and the enumeration stays Σ per-order parts² — the
  * same bound as the join it replaces.
  */
object CombinationKernels {
  private val empty = new GenericArrayData(Array.empty[Any])

  /** All pairs (a, b) with a < b from a DISTINCT long array, sorted
    * enumeration (input is sorted first, so pairs stream in
    * (a asc, b asc) order — deterministic, though consumers
    * aggregate and never rely on order).
    */
  def orderedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return empty
    val v = arr.toLongArray()
    java.util.Arrays.sort(v)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](v(i), v(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<bigint> (distinct elements) → array<struct<p1,p2>> of all
  * pairs with p1 < p2.
  */
case class OrderedLongPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = OrderedLongPairs.name

  override def dataType: DataType = OrderedLongPairs.pairArrayType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    CombinationKernels.orderedPairs(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.CombinationKernels.orderedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedLongPairs {
  val name = "ordered_long_pairs"
  val pairArrayType: DataType = ArrayType(
    StructType(Seq(
      StructField("p1", LongType, nullable = false),
      StructField("p2", LongType, nullable = false))),
    containsNull = false)
  private lazy val identifier = FunctionIdentifier(name)
  private def info = new ExpressionInfo(classOf[OrderedLongPairs].getName, name)
  private val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"$name expects one argument")
    OrderedLongPairs(children.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
