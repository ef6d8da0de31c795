package graft

import java.sql.Timestamp
import graft.functions.SkewJoin
import graft.streaming.{Event, Stateful}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatefulSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Stateful.userStats(input.toDS())
      .writeStream.format("memory").queryName("stateful_test")
      .outputMode(Stateful.outputMode).start()
    try {
      input.addData(Event(1, t(0), 1, "click", 1.5), Event(2, t(1), 1, "view", 2.5))
      q.processAllAvailable()
      input.addData(Event(3, t(2), 1, "click", 4.0), Event(4, t(3), 2, "view", 9.0))
      q.processAllAvailable()
      // update mode appends one row per updated key per batch; the
      // LAST row per user carries the accumulated state
      val last = spark.table("stateful_test")
        .groupBy($"user_id")
        .agg(max(struct($"events", $"total_value")).as("s"))
        .select($"user_id", $"s.events", $"s.total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((1L, 3L, 8.0), (2L, 1L, 9.0)))
    } finally q.stop()
  }

  test("stateful userStats also runs on a batch Dataset") {
    import spark.implicits._
    val batch = Seq(
      Event(1, t(0), 1, "click", 1.0), Event(2, t(1), 1, "view", 2.0),
      Event(3, t(2), 2, "click", 5.0)).toDS()
    val out = Stateful.userStats(batch).collect()
      .map(s => (s.user_id, s.events, s.total_value)).toSet
    assert(out === Set((1L, 2L, 3.0), (2L, 1L, 5.0)))
  }

  test("EventTimeTimeout expires idle sessions exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Stateful.expiredSessions(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("session_timeout_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events ending 10:01; user 2 one at 10:02.
      // Watermark after this batch = 10:02 (delay 0) — nobody timed out
      // yet (user 1 expires at 10:02 only when the watermark EXCEEDS it).
      input.addData(Event(1, t(0), 1, "click", 1.5),
        Event(2, t(1), 1, "view", 2.25), Event(3, t(2), 2, "click", 5.0))
      q.processAllAvailable()
      // batch 2: an unrelated user far in the future pushes the
      // watermark past both timeouts → both sessions emit, closed.
      input.addData(Event(99, t(30), 9, "click", 0.0))
      q.processAllAvailable()
      // one more empty-ish batch so timeout processing definitely runs
      input.addData(Event(100, t(31), 9, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("session_timeout_test")
        .as[Stateful.ClosedSession].collect()
        .map(cs => (cs.user_id, cs.events, cs.total_value)).toSet
      assert(out.contains((1L, 2L, 3.75)) && out.contains((2L, 1L, 5.0)),
        s"expected users 1 and 2 closed, got $out")
      // exactly once: no duplicate closures per user
      val perUser = spark.table("session_timeout_test")
        .as[Stateful.ClosedSession].collect().groupBy(_.user_id)
      assert(perUser.forall(_._2.length == 1), perUser.toString)
    } finally q.stop()
  }

  test("flatMapGroupsWithState anomalies: 0..n outputs per key, state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Stateful.anomalies(input.toDS(), factor = 3.0)
      .writeStream.format("memory").queryName("anomaly_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 baseline mean 2.0 after two events; no anomaly
      // (first event never flags, 3.0 < 3×1.0 is false → wait: 3.0 !> 3.0)
      input.addData(Event(1, t(0), 1, "click", 1.0), Event(2, t(1), 1, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_test").count() === 0)
      // batch 2: mean is now 2.0; 9.0 > 6.0 flags, 2.0 does not
      input.addData(Event(3, t(2), 1, "click", 9.0), Event(4, t(3), 1, "view", 2.0))
      q.processAllAvailable()
      val out = spark.table("anomaly_test").as[Stateful.Anomaly].collect()
      assert(out.map(a => (a.user_id, a.event_id, a.value)).toSet === Set((1L, 3L, 9.0)))
      assert(out.head.running_mean === 2.0) // state carried from batch 1
    } finally q.stop()
  }

  test("anomalies also runs on a batch Dataset") {
    import spark.implicits._
    val batch = Seq(
      Event(1, t(0), 1, "click", 1.0), Event(2, t(1), 1, "view", 1.0),
      Event(3, t(2), 1, "click", 10.0), Event(4, t(3), 2, "view", 100.0)).toDS()
    val out = Stateful.anomalies(batch).collect()
      .map(a => (a.user_id, a.event_id)).toSet
    // user 1: mean 1.0 after two events, 10.0 > 3 flags; user 2's first
    // event never flags (no baseline)
    assert(out === Set((1L, 3L)))
  }

  test("Stateful.anomalies (batch) matches the declarative q_anomaly window form") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    val stateful = Stateful.anomalies(ev, factor = 3.0)
      .collect().map(a => (a.user_id, a.event_id, a.value, a.running_mean.toFloat)).toSet
    val declarative = SparkEntry.queries("q_anomaly")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getFloat(3))).toSet
    assert(stateful === declarative)
    assert(declarative.nonEmpty)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    // skewed big side: 90% of rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 7).toLong, i))
      .toDF("k", "payload")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "tag")
    val plain = big.join(small, Seq("k"))
      .select($"k", $"payload", $"tag")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
      .select($"k", $"payload", $"tag")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  /** The q_join_skewed guarantee: with broadcast off (forcing a real
    * shuffle join, the 100 TB shape), the salted join's exchanges
    * partition on (key, __salt) and no single task carries a hot
    * key's whole row set — the plain join's worst partition must be
    * strictly worse than the salted one's.
    */
  test("q_join_skewed's salted shuffle splits the hot key across partitions") {
    import spark.implicits._
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = (1 to 2000).map(i => (if (i <= 1800) 1L else (i % 7).toLong, i))
        .toDF("k", "payload")
      val small = (0L to 6L).map(k => (k, s"tag$k")).toDF("k", "tag")
      val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
      val planStr = salted.queryExecution.executedPlan.toString
      assert(planStr.contains("__salt"),
        "salted join should shuffle on (k, __salt):\n" + planStr)
      def partSizes(df: org.apache.spark.sql.DataFrame): Seq[Int] =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq
      val plainMax = partSizes(big.join(small, Seq("k"))).max
      val saltedMax = partSizes(salted).max
      assert(saltedMax < plainMax,
        s"salting should shrink the hottest partition: salted=$saltedMax plain=$plainMax")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
