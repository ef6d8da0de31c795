package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed exact total-order rank / running-sum (SCALING.md's
  * two-pass prefix primitive). `Window.orderBy(...)` with no partition
  * key is correct but moves EVERY row to one partition — fine for a
  * calendar-bounded series, a scale killer when the window runs over
  * per-customer / per-session rows (100M+ at 100 TB). This primitive
  * computes the same ranks and inclusive running sums with all-parallel
  * stages:
  *
  *   1. range-partition on (groupCols ++ sortCols) and stamp each row
  *      with its physical partition id; `localCheckpoint` pins the
  *      sampled range boundaries so both downstream passes read the
  *      SAME partitioning (two independent range shuffles could sample
  *      different bounds and corrupt the offsets);
  *   2. per-(pid, group) partial counts/sums — one map-side-combined
  *      aggregate whose output is cluster-metadata-sized
  *      (#partitions × #groups rows), collected to the driver exactly
  *      like the storage layer's file-count metadata ops;
  *   3. exclusive prefix offsets per group computed driver-side and
  *      broadcast-joined back on (pid, group);
  *   4. a per-(pid, group)-PARTITIONED window adds the local
  *      rank/running sum to the broadcast offset — WindowExec runs on
  *      #buckets-way parallel slices, never one partition.
  *
  * The produced rank / running sums are a pure function of the total
  * order (sortCols must be a total order within each group — include a
  * unique tiebreaker), independent of where the range boundaries land,
  * so results are bit-identical to the single-partition window they
  * replace and hash-match the same DuckDB oracles.
  *
  * Group totals (`totals` / `countTotal`) ride the same partials — no
  * `Window.partitionBy()` over the data, no second aggregate pass.
  *
  * Construction is EAGER (checkpoint + metadata collect run when the
  * query function is invoked), the same contract as Dedup.verifiedPairs
  * and KMeansLite.
  */
object PrefixSum {

  /** Attach rank / running-sum / group-total columns to `df`.
    *
    * @param df         input; all referenced columns must exist on it
    * @param groupCols  running sums and ranks restart per group
    *                   (empty = one global order)
    * @param sortCols   total order within a group (include a unique
    *                   tiebreaker); `.desc` respected
    * @param rank       output name for the 1-based long row number
    * @param sums       (valueCol -> outName) inclusive running sums
    * @param totals     (valueCol -> outName) per-group total sums
    * @param countTotal output name for the per-group row count
    */
  def attach(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      rank: Option[String] = None,
      sums: Seq[(String, String)] = Nil,
      totals: Seq[(String, String)] = Nil,
      countTotal: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val pid = "__ps_pid"
    val buckets = spark.sessionState.conf.numShufflePartitions
    val rangeCols = groupCols.map(col) ++ sortCols
    val parted = df
      .repartitionByRange(buckets, rangeCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint()

    // Pass 1: per-(pid, group) partials. Output is #partitions × #groups
    // rows — the collect below is metadata-sized, not data-sized.
    val valueCols = (sums.map(_._1) ++ totals.map(_._1)).distinct
    val partialAggs = count(lit(1)).as("__ps_cnt") +:
      valueCols.map(v => sum(col(v)).as(s"__ps_s_$v"))
    val partialsDf = parted
      .groupBy((pid +: groupCols).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val pSchema = partialsDf.schema
    val pRows = partialsDf.collect()

    // Pass 2 (driver): exclusive prefix offsets in pid order per group,
    // plus group totals, over exact numeric partials.
    def zero(dt: DataType): Any = dt match {
      case LongType    => 0L
      case IntegerType => 0
      case DoubleType  => 0.0d
      case _: DecimalType => java.math.BigDecimal.ZERO
      case other => throw new IllegalArgumentException(
        s"PrefixSum: unsupported sum type $other")
    }
    def add(a: Any, b: Any): Any = (a, b) match {
      case (x, null) => x
      case (null, y) => y
      case (x: Long, y: Long)     => x + y
      case (x: Int, y: Int)       => x + y
      case (x: Double, y: Double) => x + y
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case other => throw new IllegalArgumentException(
        s"PrefixSum: unsupported sum operands $other")
    }
    val nGroup = groupCols.size
    val sumTypes = valueCols.map(v => pSchema(s"__ps_s_$v").dataType)
    val offRows = pRows
      .groupBy(r => (1 to nGroup).map(r.get).toSeq)
      .valuesIterator
      .flatMap { grp =>
        val ordered = grp.sortBy(_.getInt(0)) // pid ascending
        val totCnt = ordered.map(_.getLong(1 + nGroup)).sum
        val totSums = sumTypes.zipWithIndex.map { case (dt, i) =>
          ordered.foldLeft(zero(dt))((acc, r) => add(acc, r.get(2 + nGroup + i)))
        }
        var offCnt = 0L
        var offSums = sumTypes.map(zero)
        ordered.map { r =>
          val row = Row.fromSeq(
            (0 to nGroup).map(r.get) ++ (offCnt +: offSums) ++ (totCnt +: totSums))
          offCnt += r.getLong(1 + nGroup)
          offSums = offSums.zipWithIndex.map { case (acc, i) =>
            add(acc, r.get(2 + nGroup + i))
          }
          row
        }
      }
      .toSeq
    val offSchema = StructType(
      pSchema.fields.take(1 + nGroup) ++
        (StructField("__ps_off_cnt", LongType) +:
          valueCols.zip(sumTypes).map { case (v, dt) =>
            StructField(s"__ps_off_$v", dt)
          }) ++
        (StructField("__ps_tot_cnt", LongType) +:
          valueCols.zip(sumTypes).map { case (v, dt) =>
            StructField(s"__ps_tot_$v", dt)
          }))
    val offsetsDf = spark.createDataFrame(offRows.asJava, offSchema)

    // Pass 3: broadcast the offsets back and finish with a PARTITIONED
    // window — local rank/cumsum + the group-prefix offset.
    val joined = parted.join(broadcast(offsetsDf), pid +: groupCols)
    val wLoc = Window
      .partitionBy((pid +: groupCols).map(col): _*)
      .orderBy(sortCols: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = joined
    rank.foreach { o =>
      out = out.withColumn(o, row_number().over(wLoc).cast("long") + col("__ps_off_cnt"))
    }
    sums.foreach { case (v, o) =>
      out = out.withColumn(o, sum(col(v)).over(wRun) + col(s"__ps_off_$v"))
    }
    totals.foreach { case (v, o) =>
      out = out.withColumn(o, col(s"__ps_tot_$v"))
    }
    countTotal.foreach { o => out = out.withColumn(o, col("__ps_tot_cnt")) }
    val helper = pid +: ("__ps_off_cnt" +: "__ps_tot_cnt" +:
      valueCols.flatMap(v => Seq(s"__ps_off_$v", s"__ps_tot_$v")))
    out.drop(helper: _*)
  }

  /** `ntile(k)` derived from a total-order rank and the group size —
    * the distributed replacement for `ntile(k).over(Window.orderBy(...))`.
    * Standard SQL tiling: the first (n % k) tiles hold ceil(n/k) rows,
    * the rest floor(n/k) (identical in Spark and DuckDB). All-integer:
    * the doubles inside floor() are exact well past 2^53 headroom.
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")            // small-tile size
    val rem = n % k                              // number of big tiles
    val big = q + lit(1L)                        // big-tile size
    when(rank <= big * rem, floor((rank - 1) / big).cast("long") + 1L)
      .otherwise(rem + floor((rank - lit(1L) - big * rem) / q).cast("long") + 1L)
  }
}
