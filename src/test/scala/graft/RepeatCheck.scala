package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a named query N times in one JVM and count distinct
  * collected results — catches nondeterminism from shuffle-merge
  * order (the q_stats round-1 hash flip class of bug).
  * `sbt "Test/runMain graft.RepeatCheck q_stats /root/testdata/sf0.1 6"`
  */
object RepeatCheck {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_stats"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outs = (1 to reps).map { _ =>
      SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.mkString("|")
    }
    println(s"[repeat] $name x$reps @ $sfDir distinct_results=${outs.distinct.size}")
    println(s"[repeat] first=${outs.head.take(300)}")
    spark.stop()
  }
}
