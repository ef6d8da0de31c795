package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two sketch queries carry no DuckDB oracle (approximate by
  * design); this spec bounds their error against the exact answers on
  * the same data, which is the contract a user actually relies on.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_percentile lands within 2% of exact percentile") {
    val approx = SparkEntry.queries("q_approx_percentile")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (m, p90)) =>
      assert(math.abs(approx(k)._1 - m) / m < 0.02, s"$k median off: ${approx(k)._1} vs $m")
      assert(math.abs(approx(k)._2 - p90) / p90 < 0.02, s"$k p90 off: ${approx(k)._2} vs $p90")
    }
  }

  test("approx_count_distinct lands within 5% of exact count distinct") {
    val approx = SparkEntry.queries("q_approx_count_distinct")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k off: ${approx(k)} vs $n")
    }
  }
}
