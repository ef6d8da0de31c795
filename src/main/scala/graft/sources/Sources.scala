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

  /** Raw-file ingest via the `binaryFile` source — one row per file
    * with (path, modificationTime, length, content) — the shape an
    * image/audio/video corpus enters the pipeline in before
    * multimodal.BinaryPipeline touches the bytes. Parallelism is
    * per-file (each file one split; the source never splits a file),
    * and `glob` prunes by name AT LISTING TIME, so a
    * "*.png"-filtered scan over a mixed 100 TB bucket never even
    * stats the excluded objects' contents.
    */
  def binaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  // ---- JDBC (Spark's built-in connector; proven here against the
  // Derby embedded driver that ships in /opt/spark/jars) ------------
  //
  // Scale contract: a bare jdbc() read is ONE task holding one
  // connection — fine for dimension-sized tables, a bottleneck (and
  // an OOM risk on misbehaving drivers) for facts. Use
  // jdbcPartitioned (numeric/temporal range split: each task issues
  // its own bounded query) or jdbcByPredicates (one task per
  // caller-supplied WHERE shard) for anything big. Filters and column
  // pruning push into the generated SQL (JDBCRelation compiles
  // `.filter`/`.select` into WHERE/SELECT — `PushedFilters` visible
  // in the scan node, asserted in JdbcSourcesSpec), so the database
  // does the cheap reduction and only surviving rows cross the wire.

  /** Single-connection JDBC read (dimension-sized tables only —
    * see the scale contract above). `driver` is the JDBC driver
    * class; connection properties ride `props`.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      driver: String, props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Parallel JDBC read: `numPartitions` tasks, each issuing its own
    * `partitionColumn BETWEEN`-bounded query over an equal slice of
    * [lowerBound, upperBound]. Rows outside the bounds still arrive
    * (first/last slice are unbounded) — bounds shape parallelism,
    * never correctness.
    */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      driver: String, partitionColumn: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, p)
  }

  /** Predicate-sharded JDBC read: one task per WHERE shard — the
    * split for non-numeric keys (date ranges, hash buckets, tenant
    * lists). Shards must partition the row space: overlaps duplicate
    * rows, gaps drop them — that contract is the caller's. Predicates
    * are RAW dialect SQL pasted into each task's WHERE: quote
    * identifiers exactly as the database stores them (Spark's writer
    * creates quoted-lowercase columns; an unquoted name upcases in
    * most dialects).
    */
  def jdbcByPredicates(spark: SparkSession, url: String, table: String,
      driver: String, predicates: Seq[String],
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, predicates.toArray, p)
  }

  /** JDBC sink: per-partition connections, `batchsize`d inserts.
    * `overwrite` truncates/recreates; `append` adds rows. At scale,
    * coalesce the frame to the connection count the database can
    * actually absorb — a 1000-task write is a connection storm.
    */
  def writeJdbc(df: DataFrame, url: String, table: String, driver: String,
      mode: String = "overwrite", batchSize: Int = 1000,
      props: Map[String, String] = Map.empty): Unit = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    p.setProperty("batchsize", batchSize.toString)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, p)
  }

  /** Avro container-file reader — the graft DSv2 connector
    * (`graft.sources.avro.AvroDataSource`, short name "gavro"),
    * split-aware (block-level read parallelism within one file) with
    * reader-schema column pruning. Avro is the ingest edge format:
    * land it into parquet for the query loop.
    */
  def avro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("gavro").load(path)

  /** Avro sink: one container file per task, staged-then-renamed on
    * driver commit (atomic job output). Codec: snappy (default),
    * deflate, or null.
    */
  def writeAvro(df: DataFrame, path: String, mode: String = "overwrite",
      codec: String = "snappy"): Unit =
    df.write.format("gavro").option("compression", codec).mode(mode).save(path)

  /** Streaming tail of an Avro landing directory (collectors roll
    * container files into the dir; the pipeline consumes them exactly
    * once via a checkpointed manifest). `maxFilesPerTrigger` > 0 caps
    * files admitted per micro-batch for backpressure. Schema is
    * inferred from a present file — pass `schema` when the stream may
    * start against an empty directory.
    */
  def avroStream(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0,
      schema: Option[StructType] = None): DataFrame = {
    var r = spark.readStream.format("gavro")
    if (maxFilesPerTrigger > 0) r = r.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    schema.foreach(s => r = r.schema(s))
    r.load(path)
  }
}
