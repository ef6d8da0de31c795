package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning (`spark.sql.optimizer.runtime.
  * bloomFilter.*`): for a shuffle join where one side carries a
  * selective filter, Spark builds a Bloom filter over the filtered
  * side's join keys and pushes a `might_contain` probe into the other
  * side's scan — at 100 TB this prunes most of the fact table's rows
  * BEFORE the shuffle, which is often the single largest saving
  * available on a selective fact⋈dim join. This spec pins that the
  * injection fires in this build (so a config regression fails the
  * suite) and that it never changes results.
  */
class BloomFilterJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withBloomConf[A](enabled: Boolean)(body: => A): A = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), enabled.toString)
      // local test files are far below the default 10GB application-side
      // threshold, so drop it; disable broadcast so the join shuffles
      // (a broadcast join already prunes via the hash table)
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def urgentQuantity() = {
    val l = Tables.lineitem(spark, TestSpark.sf0001)
    val o = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
        count(lit(1)).as("n"))
  }

  test("runtime bloom filter is injected on the selective shuffle join") {
    withBloomConf(enabled = true) {
      val phys = urgentQuantity().queryExecution.executedPlan.toString
      assert(phys.contains("bloom_filter_agg"),
        "expected a bloom_filter_agg build over the filtered side's keys")
      assert(phys.contains("might_contain"),
        "expected a might_contain probe pushed into the fact side")
    }
  }

  test("bloom pruning does not change results") {
    val withBloom = withBloomConf(enabled = true) {
      urgentQuantity().collect().map(_.toSeq).toSeq
    }
    val without = withBloomConf(enabled = false) {
      urgentQuantity().collect().map(_.toSeq).toSeq
    }
    assert(withBloom === without)
    assert(withBloom.nonEmpty)
  }
}
