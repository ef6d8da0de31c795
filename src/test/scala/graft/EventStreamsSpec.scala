package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark can derive an Encoder (inner case classes
  * can't be encoded).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Drives the Structured Streaming twins through a real MemoryStream
  * → writeStream(memory sink) micro-batch pipeline and checks the
  * results equal the batch semantics.
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private val sample = Seq(
    Ev(1, t(0), 1, "click", 1.0),
    Ev(2, t(4), 1, "click", 2.0),
    Ev(3, t(12), 1, "view", 3.0),
    Ev(1, t(0), 1, "click", 1.0), // duplicate event_id
    Ev(4, t(55), 2, "click", 4.0))

  test("tumblingCounts over a MemoryStream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy($"bucket_start", $"event_type")
        .collect().map(_.toSeq).toSeq
      val batch = EventStreams.tumblingCounts(sample.toDF())
        .orderBy($"bucket_start", $"event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("dedupEvents drops the duplicate event_id in streaming mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 4)
    } finally q.stop()
    assert(EventStreams.dedupEvents(sample.toDF()).count() === 4)
  }

  test("sessionCounts merges events within the gap") {
    import spark.implicits._
    // Batch mode: user 1 has events at 10:00/10:04/10:12 (one session,
    // gaps < 30 min); user 2 one event at 10:55.
    val out = EventStreams.sessionCounts(sample.toDF().dropDuplicates(Seq("event_id")))
      .orderBy($"user_id", $"session_start")
      .collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("cnt") === 3)
    assert(out(1).getAs[Long]("cnt") === 1)
  }

  test("streaming sessionCounts runs end-to-end via MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      assert(spark.table("session_test").count() >= 2)
    } finally q.stop()
  }
}
