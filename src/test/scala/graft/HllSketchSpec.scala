package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSketches HLL surface (hll_sketch_agg / hll_union_agg /
  * hll_sketch_estimate, built into Spark 3.5+): count-distinct as a
  * MERGEABLE binary sketch. Unlike approx_count_distinct's one-shot
  * estimate, the sketch itself is a value — partial sketches computed
  * per partition / per day merge later with hll_union_agg, which is
  * how a 100 TB pipeline keeps incremental distinct-user counts
  * without ever re-reading history.
  */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hll estimate is within 5% of exact distinct") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val est = ev.select(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"est=$est exact=$exact")
  }

  test("per-group sketches union to the global estimate") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    // build one sketch per event_type, then merge the sketches —
    // never re-touching the events table
    val merged = ev
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = ev.select(
      hll_sketch_estimate(hll_sketch_agg(col("user_id")))).collect()(0).getLong(0)
    assert(merged === direct,
      "merging per-group sketches must equal the single-pass sketch")
  }
}
