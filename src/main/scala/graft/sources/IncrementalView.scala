package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped sum/count views from the
  * SnapshotTable change feed: inserts apply with weight +1, deletes
  * with −1 (update images arrive as delete-pre + insert-post under
  * `changes`, or pre/post images under `changesByKey` — both carry
  * the right signs through [[signOf]]). Because SUM and COUNT are
  * abelian-group aggregates, applying the signed delta to the
  * materialized view is EXACTLY recomputation — the spec pins
  * view-after-deltas ≡ recompute-from-latest, per commit, including
  * group disappearance (count 0 rows drop out).
  *
  * This is the consumer half of the CDC story: a 100 TB rollup
  * updates from each commit's (tiny) change set instead of re-reading
  * the table. Non-invertible aggregates (min/max, distinct) need the
  * full group re-read on delete — the standard IVM limitation,
  * documented here rather than papered over.
  */
object IncrementalView {

  /** +1 for insert/update_postimage, −1 for delete/update_preimage. */
  def signOf(changeType: Column): Column =
    when(changeType.isin("insert", "update_postimage"), lit(1L))
      .when(changeType.isin("delete", "update_preimage"), lit(-1L))
      .otherwise(lit(0L))

  /** Build the (keys → sum(valueCol), count) view of a snapshot. */
  def sumView(table: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    table.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("view_sum"), count(lit(1)).as("view_count"))

  /** Apply one change batch (a `changes`/`changesByKey` output) to a
    * materialized sum view. Groups whose count reaches zero drop out,
    * so the result is row-identical to a fresh [[sumView]] of the new
    * snapshot.
    */
  def applySumDeltas(view: DataFrame, changeBatch: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    val deltas = changeBatch.select(
      keys.map(col) :+
        (col(valueCol) * signOf(col("_change_type"))).as("d_sum") :+
        signOf(col("_change_type")).as("d_count"): _*)
    val viewAsDeltas = view.select(
      keys.map(col) :+ col("view_sum").as("d_sum") :+ col("view_count").as("d_count"): _*)
    viewAsDeltas.unionByName(deltas)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("d_sum")).as("view_sum"), sum(col("d_count")).as("view_count"))
      .filter(col("view_count") > 0)
  }
}
