package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The production registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (here via
  * withExtensions on a fresh session over the shared context) must
  * resolve every native function WITHOUT any manual register() call,
  * and carry the cosine rewrite rule. The per-query register() calls
  * in the graded queries exist only because the driver's session is
  * built without extensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers native functions at session build") {
    val base = TestSpark.spark // ensures the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s ne base, "expected a fresh session with extensions")
      val cos = s.sql(
        """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c"""
          .stripMargin).head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-9)
      val dot = s.sql(
        """SELECT dot_product(CAST(array(2.0, 3.0) AS ARRAY<FLOAT>),
          |                   CAST(array(4.0, 5.0) AS ARRAY<FLOAT>)) AS d"""
          .stripMargin).head().getDouble(0)
      assert(dot === 23.0)
      val ngrams = s.sql("SELECT char_ngrams('abcd', 3) AS g")
        .head().getSeq[String](0)
      assert(ngrams === Seq("abc", "bcd"))
      val words = s.sql("SELECT word_ngrams(array('a','b','c'), 2) AS g")
        .head().getSeq[String](0)
      assert(words === Seq("a b", "b c"))
      // the injected optimizer rule fires WITHOUT the experimental
      // escape hatch: the declarative aggregate/zip_with cosine shape
      // optimizes to the fused native expression in this session
      val declarative = Tables.embeddings(s, TestSpark.sf0001)
        .filter(org.apache.spark.sql.functions.col("vec_id") < 5)
        .select(graft.functions.VectorFunctions.cosine(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.reverse(
            org.apache.spark.sql.functions.col("embedding"))).as("c"))
      val optimized = declarative.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_sim"),
        s"RewriteCosineToNative did not fire via extensions:\n$optimized")
    } finally {
      // restore the shared test session as active/default so other
      // suites' SQL-text paths are unaffected
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
