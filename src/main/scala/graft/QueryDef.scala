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
    * (identical in both engines), sum them exactly
    * (order-independent), divide by 100.0 (one deterministic op) —
    * full cent-level bug-detection power at any magnitude. DuckDB
    * twin: `sum(CAST(round(x * 100) AS BIGINT)) / 100.0`.
    *
    * The Spark accumulator is DECIMAL(38,0), not LONG (ADVICE r9):
    * DuckDB's sum(BIGINT) promotes to HUGEINT (int128), so the
    * engines' overflow behavior was asymmetric — a whole-corpus
    * money sum at the 100 TB design point (~2.3e18 cents) sits
    * within ~4× of Long.MaxValue, where Spark would overflow while
    * the oracle stays exact. DECIMAL(38,0) holds 10^38 — both
    * engines are now exact at any realistic magnitude, and the
    * final cast to DOUBLE is the same nearest-double conversion of
    * the same exact integer on both sides.
    */
  protected def centsSum(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{round, sum}
    sum(round(x * 100).cast("decimal(38,0)")).cast("double") / 100.0
  }

  /** The matching oracle-side SQL fragment. */
  protected def centsSumSql(x: String): String =
    s"sum(CAST(round(($x) * 100) AS BIGINT)) / 100.0"
}
