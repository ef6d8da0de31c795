package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the whole declared inventory (SURVEY.md §2):
  * every query runs at sf0.001, names are unique, oracle coverage is
  * complete (modulo declared approx exemptions), and the smoke entry
  * returns rows.
  */
class InventorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val approxExempt = Set("q_approx_count_distinct", "q_approx_percentile")

  test("query names are unique and nonempty") {
    val names = SparkEntry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.startsWith("q_")))
  }

  test("every non-approx query declares an oracle") {
    val missing = SparkEntry.all
      .filter(q => q.oracle.isEmpty && !approxExempt(q.name)).map(_.name)
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
  }

  test("entry (smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001 with a stable schema") {
    val failures = SparkEntry.all.flatMap { q =>
      try {
        val df = q.fn(spark, TestSpark.sf0001)
        df.count() // force execution
        assert(df.columns.nonEmpty)
        None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
