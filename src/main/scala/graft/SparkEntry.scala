package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every QueryModule's declared inventory (SURVEY.md §2).
  */
object SparkEntry {

  /** All implemented modules. Order is stable; names must be unique. */
  def modules: Seq[QueryModule] = Seq(
    q.Relational,
    q.Joins,
    q.Aggregations,
    q.Windows,
    q.SetOps,
    q.Functions,
    q.EventsTime,
    q.Dedup,
    q.Similarity,
    q.TextAnalysis,
    q.Multimodal,
    q.Subqueries,
    q.Analytics,
    q.Supply,
    q.Lifecycle,
    q.Graphs,
    q.SqlText,
  )

  def all: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    require(ds.map(_.name).distinct.size == ds.size, "duplicate query names")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.pricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
