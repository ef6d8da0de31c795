package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dataset.observe: named accumulator-backed metrics collected DURING
  * a job with no extra pass over the data — the idiomatic way a 100 TB
  * pipeline gets row counts / null rates / quality tallies out of a
  * write job without a second scan (vs. a separate .count(), which
  * re-reads the input).
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observe() collects pipeline metrics in the same pass as the action") {
    val obs = Observation("doc_metrics")
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("lang").isNull, 1).otherwise(0)).as("null_lang"),
        max(length(col("text"))).as("max_len"))
      .filter(length(col("text")) > 0)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] === 500)
    assert(kept <= m("rows_seen").asInstanceOf[Long])
    assert(m("null_lang").asInstanceOf[Long] === 0)
    assert(m("max_len").asInstanceOf[Number].longValue > 0)
  }

  test("observed metrics see pre-filter rows (metrics attach to the plan point)") {
    val obs = Observation("pre_filter")
    // observe() placed BEFORE the filter counts all rows, even though
    // the action only returns the filtered subset
    val filtered = Tables.orders(spark, TestSpark.sf0001)
      .observe(obs, count(lit(1)).as("scanned"))
      .filter(col("o_totalprice") > 100000)
    val kept = filtered.count()
    assert(obs.get("scanned").asInstanceOf[Long] === 1500)
    assert(kept < 1500)
  }
}
