package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Hyperplane-LSH bucketing for approximate nearest neighbor
  * (SURVEY.md §2.10 scale path; used by q_ann_lsh with 8 planes).
  *
  * `n` sign bits pack into a long, so the bucket key space is 2^n —
  * 8 bits suits a toy corpus, 16-24 bits a real one (target: average
  * bucket ≈ corpus/2^n rows, small enough that the within-bucket
  * rerank is cheap, large enough that near neighbors still collide).
  * The planes table is n rows and broadcast; bucketing is one
  * crossJoin(n-row) + map-side-combined groupBy — ONE shuffle of the
  * corpus on the bucket key, which is the entire cost of the index.
  */
object LshAnn {

  /** `n` hyperplanes taken deterministically from the corpus vectors
    * with ids [start, start+n) — reproducible (no rand()) and
    * direction-diverse enough on real embedding data. Returns a
    * broadcast-hinted (plane_no, plane_emb) table.
    */
  def planesFrom(e: DataFrame, start: Long, n: Int): DataFrame = {
    require(n >= 1 && n <= 62, s"plane count must fit a long bucket key, got $n")
    broadcast(
      e.filter(col("vec_id") >= start && col("vec_id") < start + n)
        .select((col("vec_id") - start).as("plane_no"),
          col("embedding").as("plane_emb")))
  }

  /** Adds the packed sign-bit `bucket` key: bit i set iff
    * dot(embedding, plane_i) > 0. Output: (vec_id, embedding, bucket).
    * The side test uses the fused codegen DotProduct — this is the
    * corpus × planes hot loop, and the fold-based dot's per-row array
    * allocation was the dominant cost of q_ann_lsh in round 1.
    */
  def bucketize(e: DataFrame, planes: DataFrame): DataFrame = {
    graft.functions.expressions.DotProduct.register(e.sparkSession)
    e.crossJoin(planes)
      .select(col("vec_id"), col("embedding"),
        when(VF.dotFast(col("embedding"), col("plane_emb")) > 0,
          pow(lit(2), col("plane_no")).cast("long")).otherwise(0L).as("bit"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"), sum(col("bit")).as("bucket"))
  }
}
