package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event-time queries
  * (SURVEY.md §2.9). Each transform takes a DataFrame with the events
  * schema (event_id, ts timestamp, user_id, event_type, value, …) and
  * works unchanged on a batch frame or a `readStream` frame — the
  * windowing semantics are shared with graft.queries.EventsTime; the
  * watermark bounds state so a 100 TB/day stream runs in constant
  * memory per key-window.
  *
  * Deployment shape: `spark.readStream.schema(s).parquet(dir)` (or a
  * Kafka source) → one of these transforms → `writeStream` with
  * checkpointing. Tested via MemoryStream in EventStreamsSpec.
  */
object EventStreams {

  /** Tumbling 10-minute counts/sums per event type. Append mode emits
    * a window once the watermark passes its end; state is one row per
    * open (window, type).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Sliding windows (10 min width, 5 min slide). */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("bucket_start"), col("cnt"))

  /** Gap-based sessionization per user via the native session_window
    * operator; state per open session, closed by the watermark.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("cnt"), col("session_value"))

  /** Stateful exact-once dedup on the event key. In streaming mode the
    * watermark lets Spark drop per-key state once duplicates can no
    * longer arrive (dropDuplicatesWithinWatermark); the batch twin is
    * plain dropDuplicates.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("event_id"))
    else
      events.dropDuplicates(Seq("event_id"))

  /** Stream-stream join: pair each click with the views by the same
    * user in the preceding `within` interval. Both sides are
    * watermarked and the join carries an event-time range condition —
    * the two requirements that let Spark bound the join state (each
    * side's buffered rows expire once the other side's watermark
    * passes `ts + within`), so a 100 TB/day two-stream join runs in
    * state proportional to `within` × rate, not stream length. The
    * equality key (user_id) is the shuffle key on both sides.
    *
    * `joinType` "inner" emits matches as they form; "left_outer"
    * additionally emits click-with-null-view rows, but only once the
    * watermark proves no matching view can still arrive (Spark
    * requires the watermark + time-bound for exactly this reason).
    * The same call works on batch frames (withWatermark is a no-op),
    * which is what the spec compares against.
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
      within: String = "10 minutes", watermark: String = "1 minute",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    c.join(v,
      col("user_id") === col("view_user")
        && col("view_ts") >= col("click_ts") - expr(s"INTERVAL $within")
        && col("view_ts") <= col("click_ts"),
      joinType)
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Bounded catch-up ("backfill") run over a file source: process
    * everything present in `srcDir` RIGHT NOW in
    * `maxFilesPerTrigger`-file micro-batches, append to a parquet
    * sink, then self-terminate — `Trigger.AvailableNow` semantics.
    * The checkpoint makes repeated invocations exactly-once across
    * runs: a second call with the same checkpoint processes only
    * files that arrived after the first run finished. This is the
    * operational "nightly catch-up" form of a streaming pipeline; at
    * 100 TB the file chunking bounds per-batch cluster memory while
    * the checkpointed offset log bounds re-scan cost to the NEW file
    * listing, not the archive.
    *
    * A scheduled catch-up may fire before the producer has written
    * anything: pass `schema` explicitly to start the stream against an
    * empty directory, or leave it None and the run no-ops (returns
    * None) instead of crashing on schema inference — the nightly-cron
    * contract is "process what's there", and "nothing" is a valid
    * answer.
    */
  def backfillAvailableNow(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      sinkDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[org.apache.spark.sql.streaming.StreamingQuery] = {
    val resolved = schema.orElse(
      // infer only when readable files exist; empty/absent dir → no-op
      scala.util.Try(spark.read.parquet(srcDir).schema).toOption)
    resolved.map(sch => spark.readStream
      .schema(sch)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
  }
}
