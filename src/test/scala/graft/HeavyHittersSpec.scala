package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries sketch properties, verified against exact counts on
  * the sf0.001 token stream: (1) every item with true frequency
  * > n/(k+1) is in the sketch, (2) sketch counts never overcount and
  * undercount by at most n/(k+1), (3) the guarantees hold regardless
  * of partitioning (the merge is the mergeable-summaries rule, so
  * partial+final aggregation over any layout stays within bounds).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val k = 16

  /** Corpus token stream plus two injected hot tokens — the sf0.001
    * documents vocabulary is near-uniform (31 tokens, none above
    * n/(k+1)), so skew is added to give the guarantee something to
    * bite on.
    */
  private def tokens() = {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    corpus
      .union(spark.range(6000).select(lit("hot_a").as("tok")))
      .union(spark.range(4000).select(lit("hot_b").as("tok")))
  }

  private lazy val exact: Map[String, Long] =
    tokens().groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  private lazy val n: Long = exact.values.sum

  private def sketchWith(partitions: Int): Map[String, Long] = {
    HeavyHitters.register(spark, k)
    tokens().repartition(partitions)
      .agg(HeavyHitters(col("tok")).as("hh"))
      .collect()(0).getAs[Map[String, Long]]("hh")
  }

  test("all guaranteed heavy hitters survive; counts within MG error bound") {
    val sketch = sketchWith(7)
    val bound = n / (k + 1)
    val guaranteed = exact.filter(_._2 > bound).keySet
    assert(guaranteed.nonEmpty, "fixture should have heavy hitters")
    assert(guaranteed.subsetOf(sketch.keySet),
      s"missing guaranteed items: ${guaranteed -- sketch.keySet}")
    sketch.foreach { case (tok, c) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(c <= truth, s"$tok overcounted: sketch=$c true=$truth")
      assert(truth - c <= bound, s"$tok undercounted past bound: sketch=$c true=$truth")
    }
    assert(sketch.size <= k)
  }

  test("guarantees are partitioning-independent") {
    val bound = n / (k + 1)
    val guaranteed = exact.filter(_._2 > bound).keySet
    Seq(1, 3, 13).foreach { p =>
      val sketch = sketchWith(p)
      assert(guaranteed.subsetOf(sketch.keySet), s"partitions=$p")
      assert(sketch.size <= k, s"partitions=$p")
    }
  }
}
