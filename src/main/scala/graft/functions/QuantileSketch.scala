package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable DETERMINISTIC quantile sketch (SURVEY.md §2.11 UDAF
  * surface) — completes the sketch family next to MinHash
  * (similarity), Misra-Gries (heavy hitters), and HLL (distinct):
  * per group, keep the (hashKey, value) pairs with the k smallest
  * (hashKey, value) PAIRS under the total lexicographic order — the
  * full pair, not the hash alone, so equal hash keys (duplicate row
  * keys, or an xxhash64 collision) truncate identically no matter
  * which side of a reduce/merge they arrive on. Because xxhash64 of a
  * stable row key is a fixed pseudo-random rank, the kept set is a
  * uniform k-sample of the group that is IDENTICAL under any
  * partitioning, input order, or merge tree — a reservoir sample
  * without the nondeterminism reservoirs have under parallel
  * aggregation. Callers should hash a UNIQUE row key: duplicate keys
  * skew sampling uniformity (the pair order keeps them deterministic,
  * but the duplicated key is over-represented). Quantile q is then
  * the ⌈q·n⌉-th of the sorted kept values (exact when the group is
  * under k; ±O(1/√k) standard sampling error above it).
  *
  * Associative + commutative (bottom-k union), so Spark runs it
  * partial+final map-side like any built-in aggregate; sketches of
  * shards/days merge without re-reading data — the property that
  * matters at 100 TB.
  */
class QuantileSketch(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[Double]] {
  require(k > 0)

  // total order over the FULL pair: a strict-by-hash-only compare
  // would drop an equal-hash incoming element in reduce but keep it
  // in merge, making the kept set depend on the aggregation tree
  private val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)],
      in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k) (buf :+ in).sorted(ord)
    else if (ord.lt(in, buf.last)) (buf.init :+ in).sorted(ord)
    else buf

  override def merge(a: Seq[(Long, Double)],
      b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (a ++ b).sorted(ord).take(k)

  /** The kept values sorted ascending — quantiles read by rank. */
  override def finish(reduction: Seq[(Long, Double)]): Seq[Double] =
    reduction.map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object QuantileSketch {
  val name = "quantile_sketch"

  /** Register quantile_sketch(hashKey, value) keeping k samples. */
  def register(spark: SparkSession, k: Int = 64): Unit =
    spark.udf.register(name, udaf(new QuantileSketch(k)))

  def apply(hashKey: Column, value: Column): Column =
    org.apache.spark.sql.functions.call_function(name, hashKey, value)

  /** Read quantile `q` from a finished sketch array (lower rank
    * convention: element ⌈q·n⌉−1 of the ascending samples).
    */
  def quantileOf(samples: Seq[Double], q: Double): Double = {
    require(samples.nonEmpty && q >= 0.0 && q <= 1.0)
    val idx = math.max(0, math.ceil(q * samples.size).toInt - 1)
    samples(math.min(idx, samples.size - 1))
  }
}
