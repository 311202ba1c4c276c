package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** #45 q_stream_stateful — running per-user event counter with custom
  * state (SURVEY.md §2.9). Typed `mapGroupsWithState`: state is one Long
  * per active user, partitioned by the grouping key — the 100 TB shape,
  * since state shards with the shuffle and never concentrates on one
  * task. Exercised by StreamingSpec in update mode.
  */
object StatefulCounts {

  case class Ev(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  case class UserCount(user_id: Long, n: Long)

  def apply(events: Dataset[Ev]): Dataset[UserCount] = {
    implicit val outEnc = Encoders.product[UserCount]
    implicit val stateEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout()) {
        (user, evs, state) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          UserCount(user, n)
      }
  }
}

/** The same per-user counter on Spark 4.x's forward state API,
  * `transformWithState` (SURVEY.md §2.9 row 45 names it beside
  * mapGroupsWithState) — plus the piece the old API couldn't express
  * cleanly: WATERMARK-DRIVEN EVICTION via named event-time timers.
  *
  * Semantics: every micro-batch with input for a user emits the updated
  * running count and (re-)arms one timer at last-seen-event-time +
  * `idleGapMs`; when the watermark passes the deadline the timer fires,
  * the user's state is CLEARED and a tombstone row (user, 0) is emitted
  * — a later event restarts the count at 1. State per user: one Long
  * count + one Long deadline + one registered timer, all partitioned by
  * the grouping key (RocksDB-backed at scale; transformWithState
  * requires the RocksDB state-store provider). This is how a 100 TB
  * stream keeps "active user" state bounded by the activity horizon
  * instead of the user universe.
  *
  * `StreamingSpec` drives it deterministically (event-time timers fire
  * on watermark advancement, not wall clock) and cross-checks the
  * accumulation phase against the [[StatefulCounts]] twin. */
object StatefulCountsTws {
  import StatefulCounts.{Ev, UserCount}

  class CounterProcessor(idleGapMs: Long)
      extends StatefulProcessor[Long, Ev, UserCount] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var deadline: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserCount] = {
      var n = if (count.exists()) count.get() else 0L
      var lastTs = 0L
      rows.foreach { ev => n += 1; lastTs = math.max(lastTs, ev.ts.getTime) }
      count.update(n)
      // One live timer per user: re-arming replaces the old deadline —
      // but never BACKWARD: an in-watermark late event must not lower an
      // armed deadline (last-SEEN event time defines idleness), or the
      // user gets evicted before the idle gap truly elapsed.
      val prev = if (deadline.exists()) deadline.get() else Long.MinValue
      val due = math.max(lastTs + idleGapMs, prev)
      if (due != prev) {
        if (prev != Long.MinValue) getHandle.deleteTimer(prev)
        getHandle.registerTimer(due)
        deadline.update(due)
      }
      Iterator.single(UserCount(user, n))
    }

    override def handleExpiredTimer(
        user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserCount] = {
      count.clear()
      deadline.clear()
      Iterator.single(UserCount(user, 0L)) // eviction tombstone
    }
  }

  /** Events must carry a watermark on `ts` (event-time timers need it). */
  def apply(events: Dataset[Ev], idleGapMs: Long = 30L * 60 * 1000): Dataset[UserCount] = {
    implicit val outEnc: Encoder[UserCount] = Encoders.product[UserCount]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CounterProcessor(idleGapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
