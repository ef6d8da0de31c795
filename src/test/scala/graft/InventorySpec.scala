package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the whole declared inventory (SURVEY.md §2):
  * every query runs at sf0.001, names are unique, oracle coverage is
  * complete (modulo declared approx exemptions), and the smoke entry
  * returns rows.
  */
class InventorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("query names are unique and nonempty") {
    val names = SparkEntry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.startsWith("q_")))
  }

  test("every query declares an oracle") {
    // the former approx exemptions are gone: the sketch queries carry
    // bounded-comparison oracles since r7 (exact value + within-ε
    // boolean in one plan), so oracle coverage is total
    val missing = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
  }

  test("SURVEY.md §2.17 lists exactly the registered query names") {
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    // bound the slice at the next "## " heading so later sections'
    // prose can never be misread as inventory rows (ADVICE r8)
    val afterHeading = survey.split("## §2.17").last
    val section = afterHeading.indexOf("\n## ") match {
      case -1 => afterHeading
      case i  => afterHeading.take(i)
    }
    val listed = "\\| (q_[a-z0-9_]+) \\|".r
      .findAllMatchIn(section).map(_.group(1)).toSet
    val registered = SparkEntry.all.map(_.name).toSet
    val missing = registered -- listed
    val stale = listed -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"§2.17 drifted — regenerate with GenInventory. " +
        s"missing=$missing stale=$stale")
  }

  test("no query emits a nested-typed output column") {
    // The harness oracle compare hashes result columns via pandas;
    // array/map/struct values are unhashable there (q_percentile_multi
    // was the round-3 proof). Vectors must be exploded to rows or
    // canonical-string encoded (q_collect_list pattern) before return.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.all.flatMap { q =>
      val nested = q.fn(spark, TestSpark.sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      if (nested.isEmpty) None else Some(s"${q.name}: ${nested.mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
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
