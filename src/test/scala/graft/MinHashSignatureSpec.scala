package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The UDAF must agree with the declarative bottom-k formulation
  * (array_sort ∘ collect_set then slice) on real corpus data, and its
  * sketches must estimate Jaccard sensibly.
  */
class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bottom-k UDAF equals the declarative bottom-k on corpus tokens") {
    MinHashSignature.register(spark, k = 8)
    val tokens = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t != '')")).as("token"))
      .select(col("doc_id"), md5(col("token")).as("h"))

    val viaUdaf = tokens.groupBy(col("doc_id"))
      .agg(MinHashSignature(col("h")).as("sig"))
    val viaSql = tokens.groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, 8).as("sig"))

    val l = viaUdaf.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[String](1).toList)).toList
    val r = viaSql.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(l === r)
    assert(l.forall(_._2.size == 8))
  }

  test("identical inputs give identical sketches; disjoint inputs diverge") {
    import spark.implicits._
    MinHashSignature.register(spark, k = 4)
    val df = Seq(
      ("a", "h1"), ("a", "h2"), ("a", "h3"), ("a", "h4"), ("a", "h5"),
      ("b", "h1"), ("b", "h2"), ("b", "h3"), ("b", "h4"), ("b", "h5"),
      ("c", "z1"), ("c", "z2"), ("c", "z3"), ("c", "z4")
    ).toDF("g", "h")
    val sigs = df.groupBy($"g").agg(MinHashSignature($"h").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(sigs("a") === sigs("b"))
    assert(sigs("a").intersect(sigs("c")).isEmpty)
  }
}
