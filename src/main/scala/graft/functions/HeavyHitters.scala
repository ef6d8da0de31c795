package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters as a typed Aggregator (SURVEY.md §2.11
  * UDAF surface): a bounded-memory summary of at most `k` counters
  * that is guaranteed to contain every item with true frequency
  * > n/(k+1), with per-item count undercounted by at most n/(k+1).
  * The merge (counter-wise sum, then subtract the (k+1)-th largest
  * count and drop non-positive counters) preserves that guarantee, so
  * Spark runs it partial+final like any built-in aggregate — the
  * corpus-wide top terms of a 100 TB table reduce map-side to k
  * counters per partition instead of shuffling the full vocabulary.
  *
  * Agarwal et al., "Mergeable Summaries" (PODS'12) gives the merge
  * rule; the sketch itself is Misra & Gries (1982).
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all step, dropping zeroed counters
        buf.flatMap { case (key, c) =>
          if (c > 1L) Some(key -> (c - 1L)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep > 0
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) =>
        if (c - kth > 0L) Some(key -> (c - kth)) else None
      }
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  val name = "heavy_hitters"

  def register(spark: SparkSession, k: Int = 16): Unit =
    spark.udf.register(name, udaf(new HeavyHitters(k)))

  def apply(itemCol: Column): Column =
    org.apache.spark.sql.functions.call_function(name, itemCol)
}
