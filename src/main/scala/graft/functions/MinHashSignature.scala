package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k MinHash signature as a typed Aggregator (SURVEY.md §2.11
  * UDAF surface): per group, keep the k smallest hash strings seen.
  * The bottom-k sketch of md5-hashed shingles supports Jaccard
  * estimation between groups (|sketch∩| / k), and the aggregator is
  * associative + commutative, so Spark runs it partial+final like any
  * built-in — mergeable sketches are exactly what scales to 100 TB.
  *
  * Kept deliberately simple (sorted Seq buffer, k ≤ ~64): the hot
  * path alternative is a TypedImperativeAggregate with a binary
  * buffer, which this API-compatible version can be swapped for
  * without touching call sites.
  */
class MinHashSignature(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0)

  override def zero: Seq[String] = Vector.empty

  override def reduce(buf: Seq[String], hash: String): Seq[String] =
    if (buf.contains(hash)) buf
    else if (buf.size < k) (buf :+ hash).sorted
    else if (hash < buf.last) (buf.init :+ hash).sorted
    else buf

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(reduction: Seq[String]): Seq[String] = reduction

  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object MinHashSignature {
  val name = "minhash_sig"

  /** Register minhash_sig(k=8) on the session; returns a usable
    * Column builder.
    */
  def register(spark: SparkSession, k: Int = 8): Unit =
    spark.udf.register(name, udaf(new MinHashSignature(k)))

  def apply(hashCol: Column): Column =
    org.apache.spark.sql.functions.call_function(name, hashCol)
}
