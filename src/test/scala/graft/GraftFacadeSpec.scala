package graft

import org.scalatest.funsuite.AnyFunSuite

/** The user-facing facade: registered views queryable via spark.sql
  * (including the native function), named queries runnable by name.
  */
class GraftFacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registerTables exposes all tables and native functions to SQL") {
    Graft.registerTables(spark, TestSpark.sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    // native expression callable from SQL text
    val cos = spark.sql("""
      SELECT cosine_sim(a.embedding, b.embedding) AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1
    """).head().getDouble(0)
    assert(cos > -1.0 && cos < 1.0)
    val dot = spark.sql("""
      SELECT dot_product(a.embedding, a.embedding) AS d
      FROM embeddings a WHERE a.vec_id = 0
    """).head().getDouble(0)
    assert(dot > 0.0)
    // events view carries the ns→µs fix
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .head().getLong(0) > 0)
  }

  test("run() executes a named query; unknown names fail clearly") {
    assert(Graft.run(spark, "q_pricing_summary", TestSpark.sf0001).count() > 0)
    val e = intercept[IllegalArgumentException] {
      Graft.run(spark, "q_nope", TestSpark.sf0001)
    }
    assert(e.getMessage.contains("unknown query"))
    assert(Graft.inventory.size >= 74)
  }
}
