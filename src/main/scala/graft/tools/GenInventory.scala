package graft.tools

import graft.SparkEntry

/** Dev tool: emit the authoritative SURVEY §2.17 consolidation table
  * straight from the query registry (VERDICT r7 item 7 — the
  * implemented-inventory map had accreted across §2.12–§2.16 over five
  * rounds and could no longer be diffed against `SparkEntry.queries`
  * by eye). One row per registered QueryDef: name, owning module, the
  * §2 family that module implements, and how the query is graded
  * (DuckDB oracle vs declared exemption). Regenerate with
  * `sbt "runMain graft.tools.GenInventory"` and paste over §2.17
  * whenever the registry changes; InventorySpec pins that the §2.17
  * table in SURVEY.md lists exactly the registered names.
  */
object GenInventory {

  /** Module → the SURVEY §2 rows it implements. */
  val family: Map[String, String] = Map(
    "Relational"   -> "§2.2 projection/filter/sampling/profiling",
    "Joins"        -> "§2.3 join family (incl. as-of, range, skew)",
    "Aggregations" -> "§2.4 aggregation/percentiles/sketches",
    "Windows"      -> "§2.5 window functions / §2.6 ordering",
    "SetOps"       -> "§2.7 set operations",
    "Functions"    -> "§2.8 scalar/array/map/json/generator functions",
    "EventsTime"   -> "§2.9 event-time windows/sessionization (+§2.1 pruning)",
    "Dedup"        -> "§2.10 dedup family (exact/minhash/simhash/fuzzy/CC)",
    "Similarity"   -> "§2.10 similarity search (cosine/IVF/LSH/kNN)",
    "TextAnalysis" -> "§2.10 text analysis/quality/tokenization/splits",
    "Multimodal"   -> "§2.10 multimodal binary columns",
    "Subqueries"   -> "§3 SQL surface (subqueries/LATERAL/recursive CTE)",
    "Analytics"    -> "TPC-H composites + §2.4/§2.5/§2.9 analytics",
    "Supply"       -> "TPC-H composites (supply-chain shapes)",
    "Lifecycle"    -> "§2.4 exact-stat panel / §2.9 lifecycle analytics",
    "Graphs"       -> "§2.10 graph analytics (CC/PageRank/paths)",
    "SqlText"      -> "§3 SQL surface (SQL-text twins of flagship shapes)",
  )

  def table(): String = {
    val sb = new StringBuilder
    sb.append("| query | module | §2 family | grading |\n")
    sb.append("|---|---|---|---|\n")
    for (m <- SparkEntry.modules; d <- m.defs.sortBy(_.name)) {
      val mod = m.getClass.getSimpleName.stripSuffix("$")
      val grading =
        if (d.oracle.isDefined) "DuckDB oracle (rows+schema+hash)"
        else "declared approx exemption (error-bounded in ApproxSpec)"
      sb.append(s"| ${d.name} | $mod | ${family(mod)} | $grading |\n")
    }
    val oracles = SparkEntry.all.count(_.oracle.isDefined)
    sb.append(s"\nTotals: ${SparkEntry.all.size} queries, $oracles oracle-backed, " +
      s"${SparkEntry.all.size - oracles} declared exemptions.\n")
    sb.toString
  }

  /** With an argument, write the table there as UTF-8 (the forked
    * JVM's stdout charset mangles '§'); else print.
    */
  def main(args: Array[String]): Unit =
    if (args.nonEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), table())
    else print(table())
}
