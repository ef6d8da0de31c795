package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The RocksDB state store provider — Spark's bundled at-scale
  * streaming state backend (state spills to local disk instead of
  * living on the JVM heap, changelog-checkpointed; the posture for
  * 100 TB stateful pipelines whose key space outgrows executor
  * memory). Pinned here: the SAME stateful queries (windowed agg,
  * watermark dedup) produce the SAME results under
  * RocksDBStateStoreProvider as under the default provider, and the
  * provider actually engages (rocksdb metrics in the progress).
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private val sample = Seq(
    Ev(1, t(0), 1, "click", 1.0),
    Ev(2, t(4), 1, "click", 2.0),
    Ev(3, t(12), 1, "view", 3.0),
    Ev(1, t(0), 1, "click", 1.0), // duplicate event_id
    Ev(4, t(55), 2, "click", 4.0))

  test("windowed aggregation state lives in RocksDB with identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("rocks_tumbling")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("rocks_tumbling")
        .orderBy($"bucket_start", $"event_type")
        .collect().map(_.toSeq).toSeq
      val batch = EventStreams.tumblingCounts(sample.toDF())
        .orderBy($"bucket_start", $"event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // the provider actually engaged: rocksdb custom metrics appear
      // on the state operator
      val metrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray(Array.empty[String]))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in ${metrics.mkString(",")}")
    } finally q.stop()
  }

  test("watermark dedup state lives in RocksDB with identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("rocks_dedup")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      assert(spark.table("rocks_dedup").count() === 4)
    } finally q.stop()
  }
}
