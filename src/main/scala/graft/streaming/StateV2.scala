package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing on the v2 API (SURVEY.md §2.9):
  * `transformWithState` + `StatefulProcessor` — Spark 4's successor to
  * [flat]mapGroupsWithState. What the v2 API adds that matters at
  * 100 TB: NAMED typed state variables (Value/List/Map) instead of one
  * opaque state blob, per-variable TTL for unbounded keyspaces,
  * timers decoupled from input arrival (registerTimer /
  * handleExpiredTimer), and a RocksDB state store requirement that
  * keeps hot state off-heap. Both processors here are twins of the
  * v1 operators in Stateful.scala so StateV2Spec can cross-verify the
  * two APIs produce identical outputs on identical input.
  */
object StateV2 {

  /** Running per-user count + value total with a ValueState — the
    * transformWithState twin of Stateful.userStats.
    */
  class UserStatsProcessor extends StatefulProcessor[Long, Event, UserStats] {
    @transient private var stats: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserStats] = {
      var (c, sum) = if (stats.exists()) stats.get() else (0L, 0.0)
      rows.foreach { e => c += 1; sum += e.value }
      stats.update((c, sum))
      Iterator.single(UserStats(user, c, math.round(sum * 100.0) / 100.0))
    }
  }

  def userStats(events: Dataset[Event]): Dataset[UserStats] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[UserStats]
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Session close by event-time TIMER — the transformWithState twin
    * of Stateful.expiredSessions. Where the v1 op entangles timeout
    * handling with input handling (state.hasTimedOut branch), v2
    * separates them: handleInputRows only accumulates and re-arms the
    * timer; handleExpiredTimer fires when the watermark passes the
    * armed timestamp and emits the closed session exactly once.
    */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Stateful.ClosedSession] {
    @transient private var sess: ValueState[(Long, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Stateful.ClosedSession] = {
      var (n, sum, lastUs) = if (sess.exists()) sess.get() else (0L, 0.0, 0L)
      // deterministic fold order regardless of shuffle (twin contract)
      rows.toSeq.sortBy(_.event_id).foreach { e =>
        n += 1; sum += e.value
        lastUs = math.max(lastUs, e.ts.getTime * 1000L)
      }
      sess.update((n, sum, lastUs))
      // re-arm: drop any previously registered timer, set the new one
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(lastUs / 1000L + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Stateful.ClosedSession] =
      if (!sess.exists()) Iterator.empty
      else {
        val (n, sum, lastUs) = sess.get()
        sess.clear()
        Iterator.single(Stateful.ClosedSession(user, n,
          math.round(sum * 100.0) / 100.0, lastUs))
      }
  }

  def expiredSessions(events: Dataset[Event],
      gapMs: Long = 60000L): Dataset[Stateful.ClosedSession] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Stateful.ClosedSession]
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One (user, event_type) count row, emitted on every update. */
  case class TypeCount(user_id: Long, event_type: String, n: Long,
      recent_ids: Seq[Long])

  /** MapState + ListState in one processor — the two v2 state shapes
    * the twins above don't exercise: a per-user MAP of event-type
    * counts (point lookups/updates against RocksDB — the v1 API would
    * deserialize the whole blob per key per batch; MapState touches
    * only the entries the batch hits) and a bounded LIST of the k
    * most recent event ids (append-heavy state where rewriting a
    * whole array per event would be quadratic). Emits the updated
    * types each batch, with the trimmed recent-id window.
    */
  class TypeCountsProcessor(keepRecent: Int)
      extends StatefulProcessor[Long, Event, TypeCount] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState("recent",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[TypeCount] = {
      val batch = rows.toSeq.sortBy(_.event_id)
      batch.foreach { e =>
        val cur = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
        recent.appendValue(e.event_id)
      }
      // trim the recent-id window to the last keepRecent entries
      val ids = recent.get().toSeq.takeRight(keepRecent)
      recent.put(ids.toArray)
      val touched = batch.map(_.event_type).distinct.sorted
      touched.iterator.map(t => TypeCount(user, t, counts.getValue(t), ids))
    }
  }

  def typeCounts(events: Dataset[Event],
      keepRecent: Int = 3): Dataset[TypeCount] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[TypeCount]
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor(keepRecent),
        TimeMode.None(), OutputMode.Update())
  }
}
