package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF probing with a configurable probe width (SURVEY.md §2.10 scale
  * path; q_ann_ivf is the graded nprobe=1 case over precomputed
  * labels, this is the general form over any centroid table — e.g.
  * one built by KMeansLite).
  *
  * nprobe is THE recall/cost lever of IVF search: each probe scans
  * its nprobe closest clusters, so candidate volume scales linearly
  * with it while recall climbs toward exact. Centroids stay broadcast
  * (k rows); the corpus is only ever touched via its cluster
  * partition — at 100 TB, partition the corpus files by cluster_id so
  * a probe reads nprobe/k of the data.
  */
object IvfAnn {

  /** For each query vector, the ids of its `nprobe` nearest centroids
    * (L2², deterministic cluster-id tiebreak). queries: (id, emb);
    * centroids: (cluster_id, centroid). Output: (id, emb, cluster_id).
    */
  def probeClusters(queries: DataFrame, centroids: DataFrame, nprobe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1)
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist"), col("cluster_id"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("dist", VectorFunctions.l2Squared(col(embCol), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col(idCol), col(embCol), col("cluster_id"))
  }

  /** Top-k cosine neighbors for each query, scanning only the
    * query's probed clusters. corpus must carry (vec_id, embedding,
    * cluster_id) — i.e. a KMeansLite assignment (or any precomputed
    * partition label).
    */
  def search(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val probed = probeClusters(queries, centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"),
        col("cluster_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    probed
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("cand_emb"), col("cluster_id")), Seq("cluster_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFunctions.cosine(col("query_emb"), col("cand_emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("rn").as("rank"))
  }
}
