package graft

import org.apache.spark.sql.functions._

/** Dev tool: does Spark 4.1 inject a runtime BloomFilter on a
  * selective fact⋈dim join in this build, and what does the plan call
  * it?
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // disable broadcast so the join is shuffle-based (bloom only helps there)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val sf = TestSpark.sf001
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = j.queryExecution.optimizedPlan.toString
    println("[bloom] optimized contains bloom: " + plan.toLowerCase.contains("bloom"))
    val phys = j.queryExecution.executedPlan.toString
    println("[bloom] physical contains bloom: " + phys.toLowerCase.contains("bloom"))
    phys.linesIterator.filter(_.toLowerCase.contains("bloom")).take(5)
      .foreach(l2 => println("[bloom] " + l2.trim.take(160)))
    spark.stop()
  }
}
