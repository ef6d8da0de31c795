package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1) beyond the parquet tables:
  * csv/json readers with explicit schemas (schema inference is a full
  * extra pass — never use it at scale), in-memory literal tables for
  * tests, and partitioned parquet writing (the at-scale sink layout).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema — header tolerated, no inference pass. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  /** JSON-lines with explicit schema (inference would scan twice). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** In-memory literal rows (unit-test / VALUES source). */
  def inMemory(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row],
      schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  /** Parquet sink; partitionBy columns give the directory layout that
    * enables partition pruning for downstream readers at scale.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC reader — the other columnar format Spark reads vectorized
    * with pushdown/pruning; same scan properties as parquet.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink, same partition-layout contract as [[writeParquet]]. */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** XML reader (Spark 4 built-in source) with explicit schema —
    * rowTag selects the repeated element; like csv/json, never
    * infer at scale. Row-oriented text format: no pushdown/pruning,
    * so land XML into parquet at ingest and query the columnar copy.
    */
  def xml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).xml(path)

  /** XML sink (one rowTag element per row). */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  /** Line-oriented text reader: one `value` string column per line —
    * the raw-corpus ingest shape (each line a document/record) that
    * feeds the text-analysis operators before any structure exists.
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
