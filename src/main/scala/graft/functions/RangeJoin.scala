package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: `points.value BETWEEN
  * intervals.lo AND intervals.hi` as an EQUI-join on a bucket key.
  *
  * Spark plans a raw range predicate between two large tables as a
  * broadcast-nested-loop (or cartesian) join — quadratic work and a
  * driver-memory hazard once neither side broadcasts. The standard
  * fix: quantize the domain into fixed-width buckets, explode each
  * interval into the buckets it covers (map-side; ⌈span/width⌉ rows
  * per interval), hash-join point-bucket = interval-bucket, and
  * re-check the exact predicate. Work scales with bucket occupancy ×
  * interval span, not |points|×|intervals|.
  *
  * bucketWidth is the lever: ≈ the median interval span is a good
  * default (1-2 expansion rows per interval, small buckets).
  */
object RangeJoin {

  /** Inner join of `points` (with numeric `pointCol`) to `intervals`
    * (with numeric `loCol`/`hiCol`, both inclusive). All other
    * columns from both sides are carried through. Column names must
    * not collide across the two inputs.
    */
  def bucketed(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pBucket = floor(col(pointCol) / bucketWidth).cast("long")
    val expanded = intervals
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    points.withColumn("__bucket", pBucket)
      .join(expanded, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
