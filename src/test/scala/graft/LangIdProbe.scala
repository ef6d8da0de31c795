package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: stage timings for q_lang_id at sf0.1.
  * `sbt "Test/runMain graft.LangIdProbe"`
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("LI_SF", "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[li] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    Tables.documents(spark, d).count() // warmup

    def bigrams(c: org.apache.spark.sql.Column) = transform(
      sequence(lit(1), length(c) - 1), i => substr(c, i, lit(2)))
    val docs = Tables.documents(spark, d)
    val profile = docs
      .filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("lang"), explode(bigrams(col("text"))).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram"))))
      .filter(col("rnk") <= 20)
      .groupBy(col("lang"))
      .agg(collect_list(col("bigram")).as("profile_bigrams"))
      .select(col("lang").as("profile_lang"), col("profile_bigrams"))
    val sampled = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    time("sample scan")(sampled.count())
    time("sample explode only")(sampled
      .select(col("lang"), explode(bigrams(col("text"))).as("bigram")).count())
    time("sample explode+agg")(sampled
      .select(col("lang"), explode(bigrams(col("text"))).as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1))).count())
    time("profile pass")(profile.count())
    time("profile pass (2nd)")(profile.count())
    val db = docs.select(col("doc_id"), array_distinct(bigrams(col("text"))).as("db"))
    time("doc bigrams distinct")(db.count())
    time("doc bigrams distinct (sum)")(db.select(sum(size(col("db")))).head().getLong(0))
    val score = db.crossJoin(broadcast(profile))
      .select(col("doc_id"), col("profile_lang"),
        size(array_intersect(col("db"), col("profile_bigrams"))).cast("long").as("hits"))
      .filter(col("hits") > 0)
    time("score (cross+intersect)")(score.count())
    time("full q_lang_id")(SparkEntry.queries("q_lang_id")(spark, d).count())

    // array_intersect already dedupes its output, so the O(n²)
    // array_distinct over each doc's ~350 bigrams is redundant
    val db2 = docs.select(col("doc_id"), bigrams(col("text")).as("db"))
    time("db raw (no distinct)")(db2.select(sum(size(col("db")))).head().getLong(0))
    val score2 = db2.crossJoin(broadcast(profile))
      .select(col("doc_id"), col("profile_lang"),
        size(array_intersect(col("db"), col("profile_bigrams"))).cast("long").as("hits"))
      .filter(col("hits") > 0)
    time("score2 (no distinct)")(score2.count())
    val pred2 = score2
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("profile_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("profile_lang").as("predicted"))
    val full2 = docs.select(col("doc_id"), col("lang"))
      .join(pred2, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("predicted"),
        (col("lang") === col("predicted")).as("correct"))
      .orderBy(col("doc_id"))
    time("full2 (no distinct)")(full2.count())
    spark.stop()
  }
}
