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

    // Variant W: bucket cap via window (one sig evaluation feeding the
    // self-join) instead of agg+join-back
    import org.apache.spark.sql.expressions.Window
    def candidatesFrom(sigOk: org.apache.spark.sql.DataFrame) = sigOk.as("a")
      .join(sigOk.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    def verify(cand: org.apache.spark.sql.DataFrame,
        shv: org.apache.spark.sql.DataFrame) = cand
      .join(shv.select(col("doc_id").as("doc1"), col("shingles").as("sh1")), Seq("doc1"))
      .join(shv.select(col("doc_id").as("doc2"), col("shingles").as("sh2")), Seq("doc2"))
      .select(col("doc1"), col("doc2"),
        round(TF.jaccard(col("sh1"), col("sh2")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.1)
    val wOk = Window.partitionBy(col("band"), col("sig"))
    val sigOkW = sig.withColumn("bucket_n", count(lit(1)).over(wOk))
      .filter(col("bucket_n").between(2, 10)).drop("bucket_n")
    time("variant W (window cap)")(verify(candidatesFrom(sigOkW), sh).count())
    time("variant W (2nd)")(verify(candidatesFrom(sigOkW), sh).count())

    // Variant C: lazy localCheckpoint of the small sig + shingle tables
    val sigC = sig.localCheckpoint(false)
    val shC = sh.localCheckpoint(false)
    val okC = sigC.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, 10))
      .select(col("band"), col("sig"))
    time("variant C (checkpoint)")(verify(candidatesFrom(sigC.join(okC, Seq("band", "sig"))), shC).count())
    time("variant C (2nd)")(verify(candidatesFrom(sigC.join(okC, Seq("band", "sig"))), shC).count())

    // Variant WC: checkpointed sig + window cap + checkpointed sh
    def sigOkFrom(s0: org.apache.spark.sql.DataFrame) =
      s0.withColumn("bucket_n", count(lit(1)).over(wOk))
        .filter(col("bucket_n").between(2, 10)).drop("bucket_n")
    val sigC2 = sig.localCheckpoint(false)
    val shC2 = sh.localCheckpoint(false)
    time("variant WC (ckpt sig+sh)")(verify(candidatesFrom(sigOkFrom(sigC2)), shC2).count())
    time("variant WC (2nd)")(verify(candidatesFrom(sigOkFrom(sigC2)), shC2).count())
    // Variant WC2: checkpoint only sig; sh recomputed per verify side
    val sigC3 = sig.localCheckpoint(false)
    time("variant WC2 (ckpt sig only)")(verify(candidatesFrom(sigOkFrom(sigC3)), sh).count())
    time("variant WC2 (2nd)")(verify(candidatesFrom(sigOkFrom(sigC3)), sh).count())
    spark.stop()
  }
}
