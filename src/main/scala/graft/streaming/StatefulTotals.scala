package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `mapGroupsWithState` (the escape hatch for
  * semantics `groupBy().agg()` can't express — SURVEY.md design menu):
  * per-user running totals that survive across micro-batches.
  *
  * State size is |active users| x a few longs; for unbounded key spaces a
  * TTL (`GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration`)
  * bounds it — kept NoTimeout here because the spec drives a finite corpus.
  */
object StatefulTotals {

  case class Event(user_id: Long, value: Double)
  case class UserState(n: Long, total: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserTotal]
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserTotal](GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserState(n, total)
          state.update(next)
          UserTotal(userId, n, total)
      }
  }

  /** Required sink mode for mapGroupsWithState pipelines. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
