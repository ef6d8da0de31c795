package graft

/** Dev tool: time q_percentile_multi variants in-session.
  * `sbt "Test/runMain graft.PercentileProfile [sfDir]"`
  */
object PercentileProfile {
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
      println(f"[pm] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    Tables.lineitem(spark, d).count() // warmup
    import org.apache.spark.sql.functions._
    def oldShape = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(expr(
        "transform(percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.99D)), x -> cast(x AS float))")
        .as("price_quantiles"))
      .orderBy(col("l_returnflag"))
    def aggOnly = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.99D))").as("qs"))
    def exploded = aggOnly
      .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("i", "qv")))
    def withP = exploded.select(
      col("l_returnflag"),
      element_at(typedLit(Seq(0.25d, 0.5d, 0.75d, 0.99d)), col("i") + 1).as("p"),
      col("qv").cast("float").as("qval"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 3) {
      time(s"multi buffer-agg (noop) r$round") {
        noop(graft.queries.Aggregations.percentileMultiQ.fn(spark, d))
      }
      time(s"multi sort-window (noop) r$round") {
        noop(graft.queries.Aggregations.percentileWindowQ.fn(spark, d))
      }
      time(s"q_percentile_multi r$round") {
        graft.queries.Aggregations.percentileMultiQ.fn(spark, d).count()
      }
      time(s"old array shape     r$round") { oldShape.count() }
      time(s"agg only            r$round") { aggOnly.count() }
      time(s"agg+explode         r$round") { exploded.count() }
      time(s"agg+explode+p       r$round") { withP.count() }
      time(s"agg+expl+p+sort     r$round") { withP.orderBy(col("l_returnflag"), col("p")).count() }
    }
    graft.queries.Aggregations.percentileMultiQ.fn(spark, d).explain("formatted")
    spark.stop()
  }
}
