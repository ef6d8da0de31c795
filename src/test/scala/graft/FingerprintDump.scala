package graft

/** Dev tool: print the physical-plan fingerprints PlanFingerprintSpec
  * pins. `sbt "Test/runMain graft.FingerprintDump"`
  */
object FingerprintDump {
  val markers = Seq(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange hashpartitioning", "Exchange rangepartitioning",
    "BroadcastExchange", "TakeOrderedAndProject", "WindowGroupLimit",
    "ExistenceJoin")

  def fingerprint(spark: org.apache.spark.sql.SparkSession,
      name: String, sfDir: String): Map[String, Int] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      markers.map(m => m -> m.r.findAllIn(p).size).filter(_._2 > 0).toMap
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_pricing_summary", "q_join_star", "q_join_skewed",
      "q_join_range_bucketed", "q_topk_per_group", "q_sort_limit",
      "q_dedup_minhash", "q_contamination", "q_ann_ivf", "q_ann_lsh",
      "q_tf_idf", "q_shipping_priority", "q_kmeans_assign", "q_ema",
      "q_waiting_orders", "q_global_customers", "q_zipf_fit",
      "q_min_price_supplier", "q_volume_shipping", "q_dominant_supplier",
      "q_knn_join", "q_small_qty_revenue")
    names.foreach { n =>
      val fp = fingerprint(spark, n, TestSpark.sf0001).toSeq.sorted
        .map { case (k, v) => s""""$k" -> $v""" }.mkString(", ")
      println(s"""[fp] "$n" -> Map($fp),""")
    }
    spark.stop()
  }
}
