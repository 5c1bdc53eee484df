package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Closed-session emission via `flatMapGroupsWithState` + event-time
  * timeout — the custom-state streaming shape for semantics session_window
  * can't express (e.g. emitting ONLY completed sessions, enriching them
  * with arbitrary per-session state).
  *
  * Per user: events extend the open session; once the watermark passes the
  * session's last event + gap, the state times out and the closed session
  * is emitted (Append mode — each session exactly once). State is one
  * small struct per ACTIVE user, reclaimed on timeout — bounded regardless
  * of stream length. Intra-batch gap splitting is delegated to the batch
  * [[graft.operators.Sessionize]] twin; this operator's contract is
  * close-on-inactivity.
  */
object SessionEmitter {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessState(startMs: Long, endMs: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  def closedSessions(events: Dataset[Ev], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n, s.total))
          } else {
            val gapMs = gapMinutes * 60000L
            val batch = rows.toSeq
            val lo = batch.map(_.ts.getTime).min
            val hi = batch.map(_.ts.getTime).max
            val add = batch.map(_.value).sum
            state.getOption match {
              // new data can arrive BEFORE the event-time timeout fires (the
              // watermark only advances with data); if the inactivity gap is
              // already exceeded, close the old session now instead of
              // merging a 2-hour-later event into it
              case Some(s) if lo > s.endMs + gapMs =>
                val closed = ClosedSession(uid, new Timestamp(s.startMs),
                  new Timestamp(s.endMs), s.n, s.total)
                val fresh = SessState(lo, hi, batch.size.toLong, add)
                state.update(fresh)
                state.setTimeoutTimestamp(fresh.endMs + gapMs)
                Iterator(closed)
              case other =>
                val merged = other match {
                  case Some(s) => SessState(math.min(s.startMs, lo),
                    math.max(s.endMs, hi), s.n + batch.size, s.total + add)
                  case None => SessState(lo, hi, batch.size.toLong, add)
                }
                state.update(merged)
                state.setTimeoutTimestamp(merged.endMs + gapMs)
                Iterator.empty
            }
          }
      }
  }
}
