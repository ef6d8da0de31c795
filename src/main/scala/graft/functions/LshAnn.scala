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
    *
    * `nPlanes` is the count the planes table MUST have: a sparse
    * [start, start+n) id range would silently shrink the key space
    * (missing bits always 0) and degrade recall with no error. The
    * check runs inside the aggregation (raise_error per group), so it
    * fails loudly at execution without an eager count job at
    * plan-build time.
    */
  def bucketize(e: DataFrame, planes: DataFrame, nPlanes: Int): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 62,
      s"plane count must fit a long bucket key, got $nPlanes")
    graft.functions.expressions.DotProduct.register(e.sparkSession)
    e.crossJoin(planes)
      .select(col("vec_id"), col("embedding"),
        when(VF.dotFast(col("embedding"), col("plane_emb")) > 0,
          pow(lit(2), col("plane_no")).cast("long")).otherwise(0L).as("bit"))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"), sum(col("bit")).as("bucket"),
        count(lit(1)).as("np"))
      .select(col("vec_id"), col("embedding"),
        when(col("np") === nPlanes, col("bucket"))
          .otherwise(raise_error(concat(
            lit(s"LshAnn.bucketize: expected $nPlanes planes, joined "),
            col("np").cast("string")))).as("bucket"))
  }

  /** Multi-probe expansion: one row per (vector, probed bucket), the
    * probed set being the vector's own bucket plus every
    * Hamming-distance-1 neighbor (each single sign bit flipped) —
    * 1+n rows per probe. This is how recall is recovered WITHOUT
    * shrinking the key space: a near neighbor that disagrees with the
    * probe on exactly one plane still meets it in the flipped bucket,
    * while the corpus side stays bucketed at full width (the same
    * trick as q_dedup_simhash_hamming). Output keeps the original
    * bucket as `own_bucket` and the probed one as `bucket` (the join
    * key against a `bucketize` output).
    */
  def hamming1Probes(bucketed: DataFrame, n: Int): DataFrame = {
    require(n >= 1 && n <= 62, s"plane count must fit a long bucket key, got $n")
    val flips = array((lit(0L) +: (0 until n).map(i => lit(1L << i))): _*)
    bucketed
      .withColumn("flip", explode(flips))
      .select(col("vec_id"), col("embedding"), col("bucket").as("own_bucket"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
  }
}
