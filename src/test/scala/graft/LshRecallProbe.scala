package graft

import graft.functions.{LshAnn, VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: print LSH recall@k vs brute force per plane count.
  * `sbt "Test/runMain graft.LshRecallProbe"`
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val k = 10
    val wB = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    val brute = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .crossJoin(emb.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        VF.cosine(col("probe_emb"), col("cand_emb")).as("cos"))
      .withColumn("rn", row_number().over(wB)).filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id")).cache()
    brute.count()
    for (planes <- Seq(2, 3, 4, 6, 8)) {
      val bucketed = LshAnn.bucketize(emb, LshAnn.planesFrom(emb, 100, planes), planes)
      val probes = bucketed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("bucket"), col("embedding").as("probe_emb"))
      val wL = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
      val nearest = probes.join(
          bucketed.select(col("vec_id").as("cand_id"), col("bucket"),
            col("embedding").as("cand_emb")), Seq("bucket"))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          VF.cosine(col("probe_emb"), col("cand_emb")).as("cos"))
        .withColumn("rn", row_number().over(wL)).filter(col("rn") === 1)
        .select(col("probe_id"), col("cand_id"))
      val withCand = nearest.count()
      val hits = nearest.join(brute, Seq("probe_id", "cand_id")).count()
      val avgBucket = bucketed.groupBy("bucket").count().agg(avg("count")).head().getDouble(0)
      println(f"[lsh] planes=$planes%2d avg_bucket=$avgBucket%8.1f probes_with_cand=$withCand hits@$k=$hits recall=${hits.toDouble / math.max(1, withCand)}%.2f")
    }
    spark.stop()
  }
}
