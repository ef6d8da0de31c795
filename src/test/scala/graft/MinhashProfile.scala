package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Dev tool: time the q_dedup_minhash stages separately.
  * `sbt "Test/runMain graft.MinhashProfile"`
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[mh] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warmup
    Tables.documents(spark, d).count()

    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.shingles3(col("toks")).as("shingles"))
    time("tokenize+shingle only") {
      sh.select(sum(size(col("shingles")))).head().getLong(0)
    }
    val hs = sh.select(col("doc_id"), transform(col("shingles"),
      sgl => concat(md5(sgl), md5(concat(lit("x"), sgl)))).as("hs"))
    time(".. + md5 digests") {
      hs.select(sum(size(col("hs")))).head().getLong(0)
    }
    val sig = hs
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), lit(7)),
        b => struct(b.as("band"),
          array_min(transform(col("hs"), h => h.substr(b * 8 + 1, lit(8)))).as("sig")))).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    time(".. + band slices+min")(sig.count())
    val full = SparkEntry.queries("q_dedup_minhash")(spark, d)
    time("full query")(full.count())
    time("full query (2nd)")(full.count())
    spark.stop()
  }
}
