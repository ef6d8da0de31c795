package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not a spec): isolate q_dedup_events' cost from the
  * memoized eventsByDate layout construction (VERDICT r4 item 2 —
  * the 0.56→2.56 s r3→r4 bench regression was hypothesized, not
  * measured, to be the first-toucher layout write). Prints the
  * layout-construction time, then cold/warm query times. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 Test/runMain graft.DedupEventsProbe`
  */
object DedupEventsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("eventsByDate layout construction (one-time ingest)") {
      Tables.eventsByDate(spark, sfDir).limit(1).count(); ()
    }
    time("q_dedup_events cold (layout warm)") {
      SparkEntry.queries("q_dedup_events")(spark, sfDir).count(); ()
    }
    time("q_dedup_events warm") {
      SparkEntry.queries("q_dedup_events")(spark, sfDir).count(); ()
    }
    spark.stop()
  }
}
