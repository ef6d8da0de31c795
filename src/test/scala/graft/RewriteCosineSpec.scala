package graft

import graft.functions.{VectorFunctions => VF}
import graft.plans.RewriteCosineToNative
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must (1) actually fire on the portable cosine
  * shape and (2) preserve results bit-for-bit.
  */
class RewriteCosineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def probe = Tables.embeddings(spark, TestSpark.sf0001)
    .filter(col("vec_id") < 30)
    .select(col("vec_id"), col("embedding").as("a"),
      reverse(col("embedding")).as("b"))

  test("rule rewrites the declarative cosine into cosine_sim") {
    spark.experimental.extraOptimizations = Seq(RewriteCosineToNative)
    try {
      val df = probe.select(col("vec_id"), VF.cosine(col("a"), col("b")).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_sim"), optimized)
      assert(!optimized.contains("aggregate("), "fold should be gone:\n" + optimized)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewritten plan returns bit-identical results") {
    val plain = probe.select(col("vec_id"), VF.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    spark.experimental.extraOptimizations = Seq(RewriteCosineToNative)
    val rewritten =
      try probe.select(col("vec_id"), VF.cosine(col("a"), col("b")).as("c"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      finally { spark.experimental.extraOptimizations = Nil }
    assert(plain.keySet === rewritten.keySet)
    // bit-identical, not approximately equal
    assert(plain.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(rewritten(k))
    })
  }

  test("rule leaves non-cosine folds untouched") {
    spark.experimental.extraOptimizations = Seq(RewriteCosineToNative)
    try {
      val df = probe.select(VF.dot(col("a"), col("b")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_sim"))
      assert(df.count() === 30)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
