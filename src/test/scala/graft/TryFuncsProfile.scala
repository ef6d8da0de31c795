package graft

import org.apache.spark.sql.functions._

/** Dev tool: find which part of q_try_funcs costs the time under full
  * evaluation. `sbt "Test/runMain graft.TryFuncsProfile [sfDir]"`
  */
object TryFuncsProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tf] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li = Tables.lineitem(spark, d)
    li.count() // warmup
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to 2) {
      time(s"full query r$r") {
        noop(graft.queries.Functions.tryFuncs.fn(spark, d))
      }
      time(s"no orderBy r$r") {
        noop(li.select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, l_quantity - 17)").cast("float"),
          expr("try_cast(concat('x', l_returnflag) AS int)"),
          expr("try_cast(l_quantity AS int)"),
          expr("try_add(l_orderkey, l_linenumber)")))
      }
      time(s"only try_divide r$r") {
        noop(li.select(expr("try_divide(l_extendedprice, l_quantity - 17)")))
      }
      time(s"only try_cast bad r$r") {
        noop(li.select(expr("try_cast(concat('x', l_returnflag) AS int)")))
      }
      time(s"only try_cast qty r$r") {
        noop(li.select(expr("try_cast(l_quantity AS int)")))
      }
      time(s"only try_add r$r") {
        noop(li.select(expr("try_add(l_orderkey, l_linenumber)")))
      }
      time(s"orderBy only r$r") {
        noop(li.select(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber")))
      }
    }
    spark.stop()
  }
}
