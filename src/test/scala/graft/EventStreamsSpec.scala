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

  // clicks at 10:00 (u1), 10:12 (u1), 10:55 (u2); views at 10:05 (u1 —
  // within 10 min of the 10:12 click), 10:30 (u1 — matches nothing),
  // 10:50 (u2 — within 10 min of the 10:55 click)
  private val clicks = Seq(
    Ev(10, t(0), 1, "click", 1.0),
    Ev(11, t(12), 1, "click", 2.0),
    Ev(12, t(55), 2, "click", 3.0))
  private val views = Seq(
    Ev(20, t(5), 1, "view", 0.0),
    Ev(21, t(30), 1, "view", 0.0),
    Ev(22, t(50), 2, "view", 0.0))

  test("stream-stream inner join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ci = MemoryStream[Ev]; val vi = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(ci.toDF(), vi.toDF())
      .writeStream.format("memory").queryName("ssj_inner_test")
      .outputMode("append").start()
    try {
      ci.addData(clicks: _*); vi.addData(views: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_inner_test")
        .orderBy($"click_id", $"view_id").collect().map(_.toSeq).toSeq
      val batch = EventStreams.clickViewJoin(clicks.toDF(), views.toDF())
        .orderBy($"click_id", $"view_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.map(r => (r(1), r(3))) === Seq((11L, 20L), (12L, 22L)))
    } finally q.stop()
  }

  test("stream-stream left-outer join emits null-view rows after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ci = MemoryStream[Ev]; val vi = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(ci.toDF(), vi.toDF(),
      joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_outer_test")
      .outputMode("append").start()
    try {
      ci.addData(clicks: _*); vi.addData(views: _*)
      q.processAllAvailable()
      // push the watermark far past every click so unmatched clicks
      // are provably final and their null rows emit
      ci.addData(Ev(99, t(59, 59), 9, "click", 0.0))
      vi.addData(Ev(98, t(59, 59), 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("ssj_outer_test")
        .filter($"click_id" < 90)
        .orderBy($"click_id", $"view_id").collect()
      // click 10 (10:00, u1) has no view in [09:50, 10:00] → null view
      assert(out.map(r => (r.getLong(1), Option(r.get(3)))) ===
        Seq((10L, None), (11L, Some(20L)), (12L, Some(22L))))
      val batch = EventStreams.clickViewJoin(clicks.toDF(), views.toDF(),
        joinType = "left_outer")
        .orderBy($"click_id", $"view_id")
        .collect().map(r => (r.getLong(1), Option(r.get(3)))).toSeq
      assert(batch === Seq((10L, None), (11L, Some(20L)), (12L, Some(22L))))
    } finally q.stop()
  }
}
