package graft.streaming

import graft.sources.{SnapshotTable, SnapshotTransaction, TableWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRANSACTIONAL streaming sink (VERDICT r14 item 3): bus → snapshot
  * table with the source offsets committed in the SAME cross-table
  * transaction as the data, so a replayed batch is idempotent BY
  * CONSTRUCTION — not by content dedup.
  *
  * Layout under `root`: `data` (the landed rows + `batch_id`) and
  * `offsets` (one row per committed batch: batch_id, n_rows). Both
  * advance atomically through [[SnapshotTransaction.commitAll]]'s
  * write-ahead intent: either a batch's rows AND its offset row are
  * visible, or neither is. The replay guard is then a pure read of
  * the offsets table — `batch_id` already recorded means the data
  * table already holds exactly this batch's rows (the atomicity
  * guarantee), so redelivery is a no-op. There is NO window where
  * data landed but the offset didn't (the NearDupSink trio's
  * "idempotent but not atomic" caveat closed).
  *
  * Crash anatomy (BusTxnSinkSpec drives each point via the
  * SnapshotTransaction failpoint):
  *  - crash BEFORE the decision record flips: nothing visible;
  *    [[SnapshotTransaction.recover]] (run at every batch entry)
  *    rolls the staging back and redelivery lands the batch once;
  *  - crash AFTER the decision (e.g. data published, offsets not):
  *    recover rolls FORWARD — both tables complete the batch — and
  *    redelivery reads its batch_id as committed and skips. Either
  *    way: no loss, no duplication, provable from the version
  *    history alone.
  *
  * At 100 TB: the data write stages via `appendFiles` hard links
  * (cost ∝ batch + |files| metadata ops, never the table); the
  * offsets table is |batches| tiny rows; the replay-guard read is
  * one aggregate over it. foreachBatch serializes batches per query,
  * so the append's link-base never moves underneath it — and if an
  * external writer does land a commit in between, the transaction
  * CONFLICTS and the engine retries the batch rather than publishing
  * stale bytes.
  */
object BusTxnSink {

  def dataRoot(root: String) = s"$root/data"
  def offsetsRoot(root: String) = s"$root/offsets"
  def txnDir(root: String) = s"$root/_txn"

  /** Highest batch_id whose transaction committed; -1 when none. */
  def lastCommittedBatch(spark: org.apache.spark.sql.SparkSession,
      root: String): Long = {
    if (SnapshotTable.currentVersion(offsetsRoot(root)) == 0) return -1L
    val r = SnapshotTable.read(spark, offsetsRoot(root))
      .agg(max(col("batch_id"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** The foreachBatch handler: `stream.writeStream.foreachBatch(
    * BusTxnSink.ingestBatch(root) _)`. Any batch schema; rows land
    * with a `batch_id` column appended. When the batch carries bus
    * `partition`/`offset` columns, the offsets row also records the
    * per-partition offset RANGES this batch covered ("p:lo-hi,…" —
    * metadata-sized collect over |partitions| rows), so the offsets
    * table is self-describing to an external auditor, not just a
    * replay guard.
    *
    * `optimizeEvery` > 0 folds file maintenance into the stream:
    * every N-th batch first OPTIMIZEs both tables (compactFiles —
    * a normal committed version, conflict-safe against the appends).
    * Without it, each append hard-links every prior file and the
    * per-batch link cost grows with stream lifetime; with it the
    * file count — and therefore the append's metadata cost — stays
    * bounded by N × files-per-batch + compacted output.
    */
  def ingestBatch(root: String, optimizeEvery: Int = 0)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // heal any transaction a previous incarnation died inside —
    // recover is idempotent and O(interrupted txns)
    SnapshotTransaction.recover(txnDir(root))
    if (batchId <= lastCommittedBatch(spark, root)) return // replay: already atomic-committed
    if (optimizeEvery > 0 && batchId > 0 && batchId % optimizeEvery == 0) {
      Seq(dataRoot(root), offsetsRoot(root)).foreach { r =>
        if (SnapshotTable.currentVersion(r) > 0) {
          SnapshotTable.compactFiles(spark, r); ()
        }
      }
    }
    val slice = batch.withColumn("batch_id", lit(batchId)).localCheckpoint()
    try {
      val hasBusOffsets = batch.columns.contains("partition") &&
        batch.columns.contains("offset")
      val (n, ranges): (Long, String) =
        if (hasBusOffsets) {
          val per = slice.groupBy(col("partition"))
            .agg(min(col("offset")).as("lo"), max(col("offset")).as("hi"),
              count(lit(1)).as("c"))
            .collect() // |bus partitions| rows — metadata-sized
          (per.map(_.getLong(3)).sum,
            per.sortBy(_.getInt(0))
              .map(r => s"${r.getInt(0)}:${r.getLong(1)}-${r.getLong(2)}")
              .mkString(","))
        } else (slice.count(), null)
      import spark.implicits._
      val offsetRow = Seq((batchId, n, Option(ranges)))
        .toDF("batch_id", "n_rows", "ranges")
      SnapshotTransaction.commitAll(spark, txnDir(root), Seq(
        TableWrite(dataRoot(root), slice, appendFiles = true),
        TableWrite(offsetsRoot(root), offsetRow, appendFiles = true)))
      ()
    } finally SnapshotTable.freeLocalCheckpoint(slice)
  }
}
