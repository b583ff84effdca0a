package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for stateful sessionization. */
case class SessionEvent(user_id: Long, ts_ms: Long)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

private case class OpenSession(start_ms: Long, end_ms: Long, n_events: Long)

/** Custom-state sessionization via flatMapGroupsWithState (the
  * KeyValueGroupedDataset arbitrary-state API): per-user open-session
  * state; an event arriving more than `gapMs` after the session end
  * closes and emits the previous session. The declarative
  * `session_window` path (StreamingOps.sessionWindowCounts) is preferred
  * when gap-merge semantics suffice; this is the template for state
  * Catalyst can't express (e.g. per-session ML features, cross-field
  * state machines).
  *
  * State is one small case class per active user — bounded by active-key
  * cardinality; with event-time timeouts added, by activity recency.
  */
object StatefulSessionizer {

  def sessionize(spark: SparkSession, events: Dataset[SessionEvent],
                 gapMs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val closed = collection.mutable.ArrayBuffer.empty[ClosedSession]
          var open = state.getOption
          batch.toSeq.sortBy(_.ts_ms).foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.end_ms <= gapMs =>
                open = Some(s.copy(end_ms = e.ts_ms, n_events = s.n_events + 1))
              case Some(s) =>
                closed += ClosedSession(userId, s.start_ms, s.end_ms, s.n_events)
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              case None =>
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }
}
