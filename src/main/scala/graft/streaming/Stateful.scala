package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row for typed stateful processing. */
case class UserEvent(user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate carried in stream state. */
case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

/** Custom stateful streaming via KeyValueGroupedDataset state APIs
  * (SURVEY.md §2E): a per-user running counter that survives across
  * micro-batches — the shape used for custom sessionization, dedup
  * windows, or rate tracking when session_window/window can't express
  * the state machine. State is partitioned by key across executors.
  */
object Stateful {

  def updateRunning(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserRunning]): UserRunning = {
    val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
    var n = prev.n_events
    var tot = prev.total_value
    events.foreach { e => n += 1; tot += e.value }
    val next = UserRunning(userId, n, tot)
    state.update(next)
    next
  }

  /** Attach the running per-user aggregate to a stream of events. */
  def runningPerUser(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateRunning)
  }

  /** flatMapGroupsWithState variant: emit an alert row only when a
    * user's cumulative value first crosses `threshold` — the 0-or-1
    * output shape mapGroupsWithState can't express (it must emit one
    * row per key per batch).
    */
  def thresholdAlerts(
      spark: SparkSession,
      events: Dataset[UserEvent],
      threshold: Double): Dataset[UserRunning] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val crossedBefore = prev.total_value >= threshold
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(userId, n, tot)
          state.update(next)
          if (!crossedBefore && tot >= threshold) Iterator(next) else Iterator.empty
        })
  }
}
