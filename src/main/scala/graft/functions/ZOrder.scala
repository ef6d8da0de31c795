package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for two-dimensional data
  * skipping: rank both columns into 2^bits quantile buckets,
  * interleave the bucket bits into one z-value, and range-partition
  * files by it. Files then hold small RECTANGLES of (a, b) space
  * instead of stripes of one column, so per-file min/max stats
  * (SnapshotTable `statsCols`) prune selective probes on EITHER
  * column — the clustering trick behind Delta/Iceberg `ZORDER BY`.
  *
  * The bit interleave is a fold of shift/and/or column expressions —
  * plain Catalyst built-ins, codegen-friendly, no UDF. Bucketing is
  * exact-quantile via PrefixSum's distributed rank + ntileFromRank
  * (no single-partition window — a table re-layout is exactly the
  * data-proportional case that must not serialize through one task);
  * at extreme scale the cheaper approx_percentile-boundary + broadcast
  * range lookup substitution still applies when exact tiling isn't
  * required.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative bucket
    * ranks: a's bit i lands at position 2i+1, b's at 2i.
    */
  def zvalue(aBucket: Column, bBucket: Column, bits: Int = 10): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(aBucket, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bBucket, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Re-layout `df` into `numFiles` z-ordered partitions over
    * (a, b). `tiebreak` makes the ntile bucketing a total order so
    * the layout is deterministic across runs.
    */
  def layout(df: DataFrame, a: Column, b: Column, tiebreak: Column,
      numFiles: Int, bits: Int = 10): DataFrame = {
    val n = 1 << bits
    val rankedA = PrefixSum.attach(df, Nil, Seq(a, tiebreak),
      rank = Some("__ra"), countTotal = Some("__n"))
    val rankedB = PrefixSum.attach(rankedA, Nil, Seq(b, tiebreak),
      rank = Some("__rb"))
    rankedB
      .withColumn("__za", PrefixSum.ntileFromRank(col("__ra"), col("__n"), n) - 1)
      .withColumn("__zb", PrefixSum.ntileFromRank(col("__rb"), col("__n"), n) - 1)
      .withColumn("__z", zvalue(col("__za"), col("__zb"), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__ra", "__rb", "__n", "__za", "__zb", "__z")
  }
}
