package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row matching the events table schema. */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Accumulated per-user state output. */
case class UserStats(user_id: Long, events: Long, total_value: Double)

/** Arbitrary stateful processing (SURVEY.md §2.9 last row):
  * mapGroupsWithState keeps a per-key accumulator that survives
  * across micro-batches — the escape hatch when windowed aggregation
  * can't express the state machine. Works on batch frames too (one
  * "batch" of state). State size is O(|users|), bounded; at scale add
  * a timeout (GroupStateTimeout) to expire idle keys.
  */
object Stateful {

  /** Running per-user event count + value total, updated per batch. */
  def userStats(events: Dataset[Event]): Dataset[UserStats] = {
    implicit val statsEnc = Encoders.product[UserStats]
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0
          var s = s0
          it.foreach { e => c += 1; s += e.value }
          state.update((c, s))
          UserStats(user, c, math.round(s * 100.0) / 100.0)
      }
  }

  /** The streaming output mode mapGroupsWithState requires. */
  val outputMode: OutputMode = OutputMode.Update()

  /** An emitted anomaly: an event whose value exceeded `factor` × the
    * user's running mean at arrival time.
    */
  case class Anomaly(user_id: Long, event_id: Long, value: Double,
      running_mean: Double)

  /** flatMapGroupsWithState twin — the 0..n-outputs-per-key shape that
    * mapGroupsWithState (exactly 1 output) can't express: maintain a
    * running per-user mean and emit ONLY the events that arrive more
    * than `factor`× above it (then fold them into the mean). State is
    * two numbers per user; emission count per batch is data-dependent.
    * Append output mode, so a downstream file sink works directly.
    */
  def anomalies(events: Dataset[Event], factor: Double = 3.0): Dataset[Anomaly] = {
    implicit val outEnc = Encoders.product[Anomaly]
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[(Long, Double)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          // deterministic order within the group regardless of shuffle
          it.toSeq.sortBy(_.event_id).foreach { e =>
            val mean = if (n == 0) e.value else sum / n
            if (n > 0 && e.value > factor * mean)
              // float cast (not round-to-2dp) so the emitted mean is
              // bit-identical with q_anomaly's `cast("float")` column —
              // StatefulSkewSpec compares full rows across the twins
              out += Anomaly(user, e.event_id, e.value, mean.toFloat.toDouble)
            n += 1; sum += e.value
          }
          state.update((n, sum))
          out.iterator
      }
  }

  /** A session closed by event-time timeout. */
  case class ClosedSession(user_id: Long, events: Long,
      total_value: Double, last_event_us: Long)

  /** Timeout-driven state expiry — the arbitrary-state capability the
    * other ops here don't exercise: a per-user session accumulates
    * silently (no per-batch emission) and is emitted EXACTLY ONCE,
    * when the event-time watermark passes last-event + `gapMs`
    * (GroupStateTimeout.EventTimeTimeout + setTimeoutTimestamp). This
    * is how idle keys leave state on an unbounded keyspace — without
    * a timeout, per-key state on a 100 TB/day stream grows forever.
    * The native session_window aggregate covers the common aggregate
    * case; this is the shape for session state machines it can't
    * express. Streaming-only (timeouts never fire on a batch frame —
    * Spark's documented batch semantics for flatMapGroupsWithState).
    */
  def expiredSessions(events: Dataset[Event],
      gapMs: Long = 60000L): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event],
            state: GroupState[(Long, Double, Long)]) =>
          if (state.hasTimedOut) {
            val (n, sum, lastUs) = state.get
            state.remove()
            Iterator.single(ClosedSession(user, n,
              math.round(sum * 100.0) / 100.0, lastUs))
          } else {
            var (n, sum, lastUs) = state.getOption.getOrElse((0L, 0.0, 0L))
            it.toSeq.sortBy(_.event_id).foreach { e =>
              n += 1; sum += e.value
              lastUs = math.max(lastUs, e.ts.getTime * 1000L)
            }
            state.update((n, sum, lastUs))
            state.setTimeoutTimestamp(lastUs / 1000L + gapMs)
            Iterator.empty
          }
      }
  }
}
