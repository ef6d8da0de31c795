package graft

import org.scalatest.funsuite.AnyFunSuite

/** Modern SQL-text surface: named/positional parameter binding
  * (spark.sql(..., args)) and the IDENTIFIER() clause — the
  * injection-safe way generated pipelines template queries (values
  * bind as literals, identifiers resolve through a dedicated clause,
  * no string splicing).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("named parameters bind as typed literals") {
    Tables.orders(spark, TestSpark.sf0001).createOrReplaceTempView("orders_sql_v")
    val out = spark.sql(
      "SELECT count(*) AS n FROM orders_sql_v WHERE o_totalprice > :minPrice AND o_orderstatus = :st",
      Map("minPrice" -> 100000, "st" -> "F"))
      .collect()(0).getLong(0)
    val expected = spark.sql(
      "SELECT count(*) FROM orders_sql_v WHERE o_totalprice > 100000 AND o_orderstatus = 'F'")
      .collect()(0).getLong(0)
    assert(out === expected)
    assert(out > 0)
  }

  test("positional parameters bind in order") {
    val out = spark.sql("SELECT ? + ?, ?", Array(1, 2, "x")).collect()(0)
    assert(out.get(0) === 3)
    assert(out.getString(1) === "x")
  }

  test("IDENTIFIER clause resolves a parameterized column safely") {
    Tables.orders(spark, TestSpark.sf0001).createOrReplaceTempView("orders_sql_v")
    val out = spark.sql(
      "SELECT max(IDENTIFIER(:c)) AS m FROM orders_sql_v",
      Map("c" -> "o_totalprice"))
      .collect()(0)
    assert(out.getDouble(0) > 0)
  }
}
