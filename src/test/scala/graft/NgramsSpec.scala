package graft

import graft.functions.{TextFunctions => TF}
import graft.functions.expressions.{CharNgrams, WordNgrams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native n-gram kernels (expressions.CharNgrams/WordNgrams)
  * to their portable HOF twins: identical output arrays (order AND
  * duplicates) over the real corpus, so swapping them into the graded
  * queries cannot change any oracle result.
  */
class NgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  private def registered() = {
    CharNgrams.register(spark)
    WordNgrams.register(spark)
  }

  test("multi-byte UTF-8: kernel boundary math equals substring semantics") {
    // The r8 kernel computes character boundaries manually (one
    // forward byte pass instead of substringSQL's per-call scan) —
    // the corpus is ASCII, so pin the variable-width path explicitly:
    // 1-byte (a), 2-byte (é), 3-byte (中), and 4-byte (😀, one code
    // point) characters, in every adjacency. The HOF twin goes
    // through Spark's own substr (code-point semantics), which IS the
    // contract the old implementation had.
    registered()
    import spark.implicits._
    val rows = Seq("aéb中c😀d", "😀😀", "é", "中中中中", "a😀", "", "plain ascii")
      .toDF("text")
    for (n <- Seq(2, 3)) {
      val hof = transform(sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(0))),
        i => substr(col("text"), i, lit(n)))
      val native = call_function(CharNgrams.name, col("text"), lit(n))
      val bad = rows
        .select(col("text"),
          when(length(col("text")) >= n, hof).otherwise(array().cast("array<string>")).as("h"),
          native.as("n"))
        .filter(not(col("h") === col("n")))
        .collect()
      assert(bad.isEmpty, s"n=$n: ${bad.mkString(", ")}")
    }
  }

  test("native char bigrams (raw) equal transform∘sequence on the corpus") {
    registered()
    val hof = transform(sequence(lit(1), length(col("text")) - 1),
      i => substr(col("text"), i, lit(2)))
    val native = call_function(CharNgrams.name, col("text"), lit(2))
    val diff = docs.select(col("doc_id"), hof.as("h"), native.as("n"))
      .filter(not(col("h") === col("n")))
    assert(diff.count() === 0)
  }

  test("native char 8-grams equal the HOF fingerprint shingles") {
    registered()
    val hof = transform(sequence(lit(1), length(col("text")) - 7),
      i => substr(col("text"), i, lit(8)))
    val native = call_function(CharNgrams.name, col("text"), lit(8))
    val diff = docs.select(hof.as("h"), native.as("n"))
      .filter(not(col("h") === col("n")))
    assert(diff.count() === 0)
  }

  test("native word shingles equal shingles3/shingles5 on the corpus") {
    registered()
    val base = docs.select(TF.tokens(col("text")).as("toks"))
    for (n <- Seq(3, 5)) {
      val hof = if (n == 3) TF.shingles3(col("toks")) else TF.shingles5(col("toks"))
      val diff = base.select(hof.as("h"), TF.shinglesFast(col("toks"), n).as("nv"))
        .filter(not(col("h") === col("nv")))
      assert(diff.count() === 0, s"n=$n")
    }
  }

  test("edge cases: short/empty input and nulls") {
    registered()
    import spark.implicits._
    val df = Seq(("ab"), ("a"), ("")).toDF("t")
    val out = df.select(call_function(CharNgrams.name, col("t"), lit(2)).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("ab"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
    val nul = Seq[Option[String]](None).toDF("t")
      .select(call_function(CharNgrams.name, col("t"), lit(2)))
      .collect()
    assert(nul(0).isNullAt(0))
    val wn = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(call_function(WordNgrams.name, col("toks"), lit(2)).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(wn(0) === Seq("a b", "b c"))
  }

  test("kernels run inside whole-stage codegen (no fallback errors)") {
    registered()
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = docs.select(explode(call_function(CharNgrams.name,
        col("text"), lit(2)))).count()
      assert(n > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
