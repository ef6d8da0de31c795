package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression —
  * the fuzzy-name-match primitive Spark lacks (it ships levenshtein
  * and soundex but no Jaro family).
  *
  * Semantics are pinned to the convention DuckDB's
  * jaro_winkler_similarity implements, adversarially fuzz-verified on
  * 6000 generated pairs (0 mismatches at 1e-12) so the oracle can be
  * the real DuckDB function rather than a hand-unrolled SQL twin:
  *  - either input empty → 0.0 (including both empty);
  *  - match window = max(len)/2 − 1 (integer floor, clamped ≥ 0);
  *  - greedy left-to-right matching of s1's chars against the
  *    earliest unmatched in-window char of s2;
  *  - transpositions t = (out-of-order matched chars)/2 in INTEGER
  *    division — the floor is observable on odd counts and is where
  *    naive fractional-t implementations diverge;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3;
  *  - Winkler boost only when jaro > 0.7: j + min(prefix,4)·0.1·(1−j).
  *
  * The kernel lives in [[JaroWinklerAlgo]] (a static method) and both
  * the interpreted path and codegen call it, so the expression stays
  * inside whole-stage codegen spans (one static call, no virtual
  * dispatch) while the O(len·window) scratch arrays stay out of the
  * generated source.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.JaroWinklerAlgo.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Standalone object (not the case-class companion) so Scala emits a
  * plain static forwarder `JaroWinklerAlgo.compute` that generated
  * Java can call directly.
  */
object JaroWinklerAlgo {

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    // Char-level comparison over the decoded strings: UTF8String byte
    // offsets would miscount multi-byte characters' window positions.
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = (if (l1 > l2) l1 else l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var tcount = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) tcount += 1
        k += 1
      }
      i += 1
    }
    val t = tcount / 2 // integer floor — see class doc
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = if (l1 < l2) l1 else l2
    while (p < 4 && p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

object JaroWinkler {
  val name = "jaro_winkler"

  val identifier: FunctionIdentifier = FunctionIdentifier(name)

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[JaroWinkler].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$name expects 2 arguments")
    JaroWinkler(children.head, children(1))
  }

  /** Idempotent per-session registration (for sessions not built with
    * GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(identifier, info, builder)
}
