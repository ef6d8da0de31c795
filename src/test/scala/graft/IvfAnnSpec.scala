package graft

import graft.functions.{IvfAnn, KMeansLite, VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** nprobe is IVF's recall/cost lever: widening the probe set must
  * increase (or hold) recall against brute force while scanning more
  * candidates. Runs on the real fixture embeddings over a KMeansLite
  * quantizer.
  */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val points = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"), col("embedding"))

  private lazy val (centroids, assigned) =
    KMeansLite.fit(points, k = 10, iterations = 3)

  private lazy val bruteTop10 = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    points.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .crossJoin(points.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        VF.cosine(col("probe_emb"), col("cand_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("probe_id"), col("cand_id"))
      .localCheckpoint()
  }

  /** recall@10 of IVF top-1 and the candidate count at an nprobe. */
  private def recallAndWork(nprobe: Int): (Double, Long) = {
    val queries = points.filter(col("vec_id") < 20)
    val corpus = assigned.select(col("vec_id"), col("embedding"), col("cluster_id"))
    val top1 = IvfAnn.search(queries, corpus, centroids, nprobe, k = 1)
      .select(col("query_id").as("probe_id"), col("cand_id"))
    val hits = top1.join(bruteTop10, Seq("probe_id", "cand_id")).count()
    val n = top1.count()
    assert(n > 0)
    val candidates = IvfAnn.probeClusters(queries, centroids, nprobe)
      .join(corpus.select(col("cluster_id")), Seq("cluster_id")).count()
    (hits.toDouble / n, candidates)
  }

  test("IvfAnn.search output column contract") {
    val out = IvfAnn.search(points.filter(col("vec_id") < 3),
      assigned.select(col("vec_id"), col("embedding"), col("cluster_id")),
      centroids, nprobe = 1, k = 3)
    assert(out.columns.toSeq === Seq("query_id", "cand_id", "rank"))
    assert(out.count() > 0)
  }

  test("wider nprobe trades candidate volume for recall") {
    val (r1, w1) = recallAndWork(1)
    val (r3, w3) = recallAndWork(3)
    assert(w3 > w1, s"nprobe=3 must scan more candidates: $w1 vs $w3")
    assert(r3 >= r1, s"recall must not drop when probing wider: $r1 -> $r3")
    assert(r3 >= 0.4, s"nprobe=3 recall@10 collapsed: $r3")
  }
}
