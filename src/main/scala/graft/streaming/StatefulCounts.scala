package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

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
