package graft

import graft.queries.Aggregations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the sketch-backed queries. Since r8 the graded
  * forms emit (exact value, within-tolerance boolean) rows and carry
  * full DuckDB oracles; this spec keeps the stronger RAW contracts
  * honest — it bounds the raw sketch output against exact answers on
  * the same data (the error bar a user actually relies on), and
  * asserts the graded booleans come out true end-to-end.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_percentile lands within 2% of exact percentile") {
    val approx = Aggregations.approxPercentileRaw(spark, TestSpark.sf0001)
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

  test("approx_top_k recovers the exact heavy hitters (Spark 4 built-in)") {
    // event_type is low-cardinality with clear frequency separation,
    // so the sketch's top-3 must match the exact top-3 set and the
    // reported counts must be exact for items that fit the sketch
    val exact = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = Tables.events(spark, TestSpark.sf0001)
      .agg(expr("approx_top_k(event_type, 3)").as("tk"))
      .selectExpr("explode(tk) AS e").selectExpr("e.item", "e.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.keySet === exact.keySet,
      s"sketch $sketch vs exact $exact")
    exact.foreach { case (k, n) =>
      assert(sketch(k) === n, s"$k count ${sketch(k)} vs exact $n")
    }
  }

  test("q_percentile_approx_scale raw vector tracks the exact quantiles within 2%") {
    val approx = Aggregations.percentileApproxScaleRaw(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = SparkEntry.queries("q_percentile_multi")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getFloat(2).toDouble).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) / v < 0.02, s"$k off: ${approx(k)} vs $v")
    }
  }

  test("q_band_by_quantile raw counts put ~25% of each group in each band") {
    val bands = Aggregations.bandCountsRaw(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = bands.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    totals.foreach { case (flag, n) =>
      (1L to 4L).foreach { b =>
        val share = bands.getOrElse((flag, b), 0L).toDouble / n
        // t-digest boundary error plus duplicate-value mass: generous
        // ±8 points around the ideal quarter still catches a broken
        // banding compare (which lands whole quarters in one band)
        assert(share > 0.17 && share < 0.33,
          s"$flag band $b share $share, counts ${bands.filter(_._1._1 == flag)}")
      }
    }
  }

  test("approx_count_distinct lands within 5% of exact count distinct") {
    val approx = Aggregations.approxDistinctRaw(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k off: ${approx(k)} vs $n")
    }
  }

  test("the graded within-tolerance booleans hold end-to-end at two SFs") {
    // the oracle hard-codes TRUE; this asserts the Spark side agrees
    // BEFORE the driver does, at both tested scales
    for (sf <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val acd = SparkEntry.queries("q_approx_count_distinct")(spark, sf).collect()
      assert(acd.nonEmpty && acd.forall(_.getBoolean(2)), s"HLL out of bound at $sf")
      val ap = SparkEntry.queries("q_approx_percentile")(spark, sf).collect()
      assert(ap.nonEmpty && ap.forall(r => r.getBoolean(3) && r.getBoolean(4)),
        s"approx percentile out of bound at $sf")
      val pas = SparkEntry.queries("q_percentile_approx_scale")(spark, sf).collect()
      assert(pas.nonEmpty && pas.forall(_.getBoolean(3)),
        s"approx quantile vector out of bound at $sf")
      val bbq = SparkEntry.queries("q_band_by_quantile")(spark, sf).collect()
      assert(bbq.length % 4 == 0 && bbq.forall(_.getBoolean(3)),
        s"band shares out of bound at $sf")
    }
  }
}
