package graft

import java.sql.Timestamp
import graft.streaming.{Event, StateV2, Stateful}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState (arbitrary state v2) against its v1 twins.
  * Runs in an isolated child session because the v2 API requires the
  * RocksDB state store provider, which must not leak into the other
  * suites' streaming tests (provider is read from session conf at
  * query start).
  */
class StateV2Spec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("transformWithState ValueState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StateV2.userStats(input.toDS())
      .writeStream.format("memory").queryName("tws_stats")
      .outputMode("update").start()
    try {
      input.addData(Event(1, t(0), 1, "click", 1.5), Event(2, t(1), 1, "view", 2.5))
      q.processAllAvailable()
      input.addData(Event(3, t(2), 1, "click", 4.0), Event(4, t(3), 2, "view", 9.0))
      q.processAllAvailable()
      val last = spark.table("tws_stats")
        .groupBy($"user_id")
        .agg(max(struct($"events", $"total_value")).as("s"))
        .select($"user_id", $"s.events", $"s.total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((1L, 3L, 8.0), (2L, 1L, 9.0)))
    } finally q.stop()
  }

  test("v2 userStats matches the v1 mapGroupsWithState twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Event(1, t(0), 1, "click", 1.0), Event(2, t(1), 1, "view", 2.0),
      Event(3, t(2), 2, "click", 5.0), Event(4, t(3), 3, "view", 0.5),
      Event(5, t(4), 3, "click", 1.5))
    // v1 runs on a batch Dataset directly
    val v1 = Stateful.userStats(data.toDS()).collect()
      .map(s => (s.user_id, s.events, s.total_value)).toSet
    // v2 through a single-batch stream
    val input = MemoryStream[Event]
    val q = StateV2.userStats(input.toDS())
      .writeStream.format("memory").queryName("tws_twin")
      .outputMode("update").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val v2 = spark.table("tws_twin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(v2 === v1, s"v2 $v2 != v1 $v1")
    } finally q.stop()
  }

  test("event-time timer closes idle sessions exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StateV2.expiredSessions(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("tws_timer")
      .outputMode("append").start()
    try {
      // batch 1: user 1 ends 10:01, user 2 ends 10:02; watermark 10:02
      // — no timer has EXPIRED yet (expiry needs watermark > armed ts)
      input.addData(Event(1, t(0), 1, "click", 1.5),
        Event(2, t(1), 1, "view", 2.25), Event(3, t(2), 2, "click", 5.0))
      q.processAllAvailable()
      // batch 2: far-future event pushes the watermark past both timers
      input.addData(Event(99, t(30), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(100, t(31), 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("tws_timer")
        .as[Stateful.ClosedSession].collect()
        .map(cs => (cs.user_id, cs.events, cs.total_value)).toSet
      assert(out.contains((1L, 2L, 3.75)) && out.contains((2L, 1L, 5.0)),
        s"expected users 1 and 2 closed, got $out")
      val perUser = spark.table("tws_timer")
        .as[Stateful.ClosedSession].collect().groupBy(_.user_id)
      assert(perUser.forall(_._2.length == 1), perUser.toString)
    } finally q.stop()
  }

  test("MapState counts per event type; ListState keeps a trimmed recent window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StateV2.typeCounts(input.toDS(), keepRecent = 3)
      .writeStream.format("memory").queryName("tws_map")
      .outputMode("update").start()
    try {
      input.addData(Event(1, t(0), 1, "click", 1.0), Event(2, t(1), 1, "view", 2.0),
        Event(3, t(2), 1, "click", 3.0))
      q.processAllAvailable()
      input.addData(Event(4, t(3), 1, "click", 4.0), Event(5, t(4), 1, "buy", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tws_map").as[StateV2.TypeCount].collect()
      // batch 2 emitted the updated types with accumulated counts
      val batch2 = rows.filter(r => r.recent_ids == Seq(3L, 4L, 5L))
        .map(r => (r.event_type, r.n)).toSet
      assert(batch2 === Set(("click", 3L), ("buy", 1L)),
        s"got ${rows.mkString(", ")}")
      // batch 1 rows carried the un-trimmed (≤3) window [1,2,3]
      val batch1 = rows.filter(r => r.recent_ids == Seq(1L, 2L, 3L))
        .map(r => (r.event_type, r.n)).toSet
      assert(batch1 === Set(("click", 2L), ("view", 1L)), rows.mkString(", "))
    } finally q.stop()
  }

  test("re-armed timers fire at the LATEST session end, not the first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StateV2.expiredSessions(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("tws_rearm")
      .outputMode("append").start()
    try {
      // user 1 event at 10:00 arms a timer for 10:01
      input.addData(Event(1, t(0), 1, "click", 1.0))
      q.processAllAvailable()
      // second event at 10:05 re-arms to 10:06 BEFORE any expiry;
      // watermark after this batch is 10:05 < 10:06 → still open
      input.addData(Event(2, t(5), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("tws_rearm").isEmpty,
        "session closed despite re-armed timer")
      // push the watermark past 10:06 → one closure with BOTH events
      input.addData(Event(99, t(30), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(100, t(31), 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("tws_rearm")
        .as[Stateful.ClosedSession].collect()
        .filter(_.user_id == 1L)
        .map(cs => (cs.events, cs.total_value)).toSet
      assert(out === Set((2L, 3.0)), s"got $out")
    } finally q.stop()
  }
}
