package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded inventory entry (SURVEY.md §2): a named Spark query plus,
  * when SQL-expressible, its DuckDB oracle twin. Determinism contract
  * (SURVEY §5): result carries a total ORDER BY with unique tiebreak,
  * double aggregates are round()ed on both sides, and column names
  * match exactly between Spark and oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
