package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Dev tool: time q_contamination variants at a given SF to pick the
  * graded formulation (VERDICT r2 item 5 — the suite's wall-clock
  * tail). `sbt "Test/runMain graft.ContamProbe /root/testdata/sf0.1 3"`
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def split(s: SparkSession, d: String) = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b", "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "d", "val")
          .otherwise("test").as("split"))

    def gramsHashed(df: DataFrame, hexLen: Int) = df
      .select(col("doc_id"),
        explode(array_distinct(TF.shingles5(TF.tokens(col("text"))))).as("g"))
      .select(col("doc_id"), substring(md5(col("g")), 1, hexLen).as("gh"))

    def gramsRaw(df: DataFrame) = df
      .select(col("doc_id"),
        explode(array_distinct(TF.shingles5(TF.tokens(col("text"))))).as("gh"))

    def gramsXx(df: DataFrame) = df
      .select(col("doc_id"),
        explode(array_distinct(TF.shingles5(TF.tokens(col("text"))))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))

    def run(name: String, mk: DataFrame => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val sp = split(spark, sfDir)
        val trainGrams = mk(sp.filter(col("split") === "train")).select(col("gh")).distinct()
        val q = mk(sp.filter(col("split") === "test"))
          .join(trainGrams, Seq("gh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_grams"))
        val t0 = System.nanoTime()
        val n = q.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[contam] $name%-12s rows=${times.head._2} times=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    run("md5_16", gramsHashed(_, 16))
    run("md5_8", gramsHashed(_, 8))
    run("raw", gramsRaw)
    run("xxhash64", gramsXx)

    // Stage-level costs (what actually dominates?)
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[contam] $name%-22s n=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    val sp = split(spark, sfDir)
    time("scan_only") { sp.filter(col("split") =!= "val").count() }
    time("tokens_only") { sp.filter(col("split") =!= "val")
      .select(size(TF.tokens(col("text"))).as("n")).agg(sum("n")).count() }
    time("shingle_only") { sp.filter(col("split") =!= "val")
      .select(size(TF.shingles5(TF.tokens(col("text")))).as("n")).agg(sum("n")).count() }
    time("train_explode") { gramsRaw(sp.filter(col("split") === "train")).count() }
    time("train_distinct") { gramsRaw(sp.filter(col("split") === "train"))
      .select("gh").distinct().count() }
    time("test_explode") { gramsRaw(sp.filter(col("split") === "test")).count() }
    // tokens bound to an attribute first: the HOF lambda then reads a
    // materialized array instead of re-running filter(split(text))
    // per element_at evaluation
    def gramsBound(df: DataFrame) = df
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(TF.shingles5(col("toks")))).as("gh"))
    time("train_explode_bound") { gramsBound(sp.filter(col("split") === "train")).count() }
    time("bound_full") {
      gramsBound(sp.filter(col("split") === "test"))
        .join(gramsBound(sp.filter(col("split") === "train")).select("gh").distinct(),
          Seq("gh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1))).count()
    }
    time("semi_nodistinct") {
      gramsRaw(sp.filter(col("split") === "test"))
        .join(gramsRaw(sp.filter(col("split") === "train")).select("gh"),
          Seq("gh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
