package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 stage-level profiling scratchpad: times labeled
  * sub-plans of the bench tails so optimization targets the stage
  * that actually costs (guide §1.1). Bench-identical session config.
  * Usage: sbt "Test/runMain graft.ProfileR17 <probe> [reps]"
  */
object ProfileR17 {
  private def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[profile] $label%-50s min=${ts.min}%6.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
  }
  private def cnt(df: DataFrame): Unit = { df.count(); () }

  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("wm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    probe match {
      case "wm" =>
        val w = Tables.lineitem(spark, d).select(col("l_returnflag").as("flag"),
          round(round(col("l_extendedprice"), 2) * 100, 0).cast("long").as("price_cents"),
          col("l_quantity").cast("long").as("qty"))
        time("scan+project")(cnt(w))
        val agg = w.groupBy(col("flag"), col("price_cents"))
          .agg(sum(col("qty")).as("wsum"))
        time("scan+agg")(cnt(agg))
        val wOrd = Window.partitionBy(col("flag")).orderBy(col("price_cents"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val cum = agg.withColumn("cw", sum(col("wsum")).over(wRun))
          .withColumn("tw", sum(col("wsum")).over(wAll))
        time("scan+agg+window")(cnt(cum))
        time("full q_weighted_median")(cnt(SparkEntry.queries("q_weighted_median")(spark, d)))
      case "pw" =>
        val li = Tables.lineitem(spark, d)
        val agg = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(count(lit(1)).as("c"))
        time("scan+agg")(cnt(agg))
        val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
        val cum = agg
          .withColumn("cum", sum(col("c")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("c")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        time("scan+agg+window(1 exec)")(cnt(cum))
        val ps = typedLit(Seq(0.25d, 0.5d, 0.75d, 0.99d))
        val filt = cum.withColumn("lo", col("cum") - col("c") + 1)
          .filter(exists(ps, p =>
            (floor(lit(1) + p * (col("n") - 1)) >= col("lo") &&
              floor(lit(1) + p * (col("n") - 1)) <= col("cum")) ||
              (ceil(lit(1) + p * (col("n") - 1)) >= col("lo") &&
                ceil(lit(1) + p * (col("n") - 1)) <= col("cum"))))
        time("...+boundary filter")(cnt(filt))
        time("full q_percentile_window")(cnt(SparkEntry.queries("q_percentile_window")(spark, d)))
      case "inc" =>
        queries.Dedup.warm(spark, d)
        import graft.functions.{TextFunctions => TF}
        val batchSh = Tables.documents(spark, d).filter(col("doc_id") >= 400)
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .select(col("doc_id"), TF.shinglesFast(col("toks"), 3).as("shingles"))
        time("batch tokenize+shingle")(cnt(batchSh))
        val batchBands = batchSh
          .select(col("doc_id"), transform(col("shingles"),
            sgl => concat(md5(sgl), md5(concat(lit("x"), sgl)))).as("hs"))
          .select(col("doc_id"), explode(transform(
            sequence(lit(0), lit(7)),
            b => struct(
              b.as("band"),
              array_min(transform(col("hs"),
                h => h.substr(b * 8 + 1, lit(8)))).as("sig")))).as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        time("batch banding (md5)")(cnt(batchBands))
        println(s"[profile] docs=${Tables.documents(spark, d).count()}, batch=${Tables.documents(spark, d).filter(col("doc_id") >= 400).count()}")
        time("full q_dedup_minhash_incremental", 4)(
          cnt(SparkEntry.queries("q_dedup_minhash_incremental")(spark, d)))
      case q =>
        if (!sys.env.get("SPARK_GRAFT_PLAN_WARM").contains("0"))
          Graft.warmAll(spark, d)
        time(s"full $q", 4)(cnt(SparkEntry.queries(q)(spark, d)))
    }
    spark.stop()
  }
}
