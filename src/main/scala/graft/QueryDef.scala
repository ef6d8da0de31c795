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

  /** Money-sum grading pattern (ADVICE r8): an order-independent,
    * cent-exact sum. Per-row money doubles are bit-identical across
    * engines (same IEEE ops on the same operands); only the SUM's
    * merge order diverges. The old encoding — float-cast after
    * round(sum, 2) — absorbed that drift by throwing away sensitivity
    * (float32 ulp at 1e9 is ~128, so dollar-level engine divergences
    * became ungradable). Instead: round each ROW to integer cents
    * (identical in both engines), sum the longs (order-independent,
    * exact), divide by 100.0 (one deterministic op) — full cent-level
    * bug-detection power at any magnitude. DuckDB twin:
    * `sum(CAST(round(x * 100) AS BIGINT)) / 100.0`.
    */
  protected def centsSum(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{round, sum}
    sum(round(x * 100).cast("long")) / 100.0
  }

  /** The matching oracle-side SQL fragment. */
  protected def centsSumSql(x: String): String =
    s"sum(CAST(round(($x) * 100) AS BIGINT)) / 100.0"
}
