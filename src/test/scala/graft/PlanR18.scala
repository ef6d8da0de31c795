package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-18 optimization deliverable: dump `.explain("formatted")` for
  * the named queries into plans/r18/<query>_<suffix>.txt — one file
  * per query, the shape the optimization judge diffs against the
  * code's claims (PlanR17 precedent). Usage:
  *
  *   sbt "Test/runMain graft.PlanR18 <suffix> <q1> <q2> ..."
  *
  * Plans are taken at sf0.001 (plan SHAPE is scale-invariant for the
  * declared queries; PLANS.md precedent) with the Bench session's
  * join/AQE posture so the dumped strategy matches what the bench
  * runs. Queries that read warmed artifacts get warmAll first so the
  * dumped plan is the steady-state plan the bench times.
  */
object PlanR18 {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (!sys.env.get("SPARK_GRAFT_PLAN_WARM").contains("0"))
      Graft.warmAll(spark, sf)
    val dir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r18"))
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"),
        s"== $name ($suffix) — explain(formatted) at $sf ==\n\n" + plan)
      println(s"[plan-r18] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
