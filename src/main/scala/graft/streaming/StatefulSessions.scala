package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState: streaming gap-based
  * sessionization (the stateful twin of TpchQueries.sessionize, which
  * is the batch window formulation).
  *
  * State per user = the open session (start/last/count/revenue).
  * Events extend it; a >30 min event-time gap closes it and emits a
  * [[SessionOut]] row; event-time timeout (watermark-driven) closes
  * idle sessions without waiting for the user's next event.
  *
  * Scale: state is one small record per ACTIVE user, partitioned by
  * the group key (one shuffle); the watermark bounds both state size
  * and replay depth — this is the standard streaming-sessionization
  * architecture at any scale.
  */
object StatefulSessions {

  val GapSeconds = 1800L

  case class EventIn(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                     event_type: String, value: Double)

  case class SessionState(startSec: Long, lastSec: Long, events: Int, revenue: Double)

  case class SessionOut(user_id: Long, session_start_sec: Long, session_end_sec: Long,
                        session_events: Int, session_revenue: Double, closed_by: String)

  private[streaming] def fold(state: Option[SessionState], events: Seq[EventIn]):
      (Seq[SessionOut], Option[SessionState], Long) = {
    var cur = state
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var userId = -1L
    events.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      userId = e.user_id
      val sec = e.ts.getTime / 1000
      val rev = if (e.event_type == "purchase") e.value else 0.0
      cur match {
        case Some(s) if sec - s.lastSec <= GapSeconds =>
          cur = Some(s.copy(lastSec = sec, events = s.events + 1, revenue = s.revenue + rev))
        case Some(s) =>
          out += SessionOut(e.user_id, s.startSec, s.lastSec, s.events, s.revenue, "gap")
          cur = Some(SessionState(sec, sec, 1, rev))
        case None =>
          cur = Some(SessionState(sec, sec, 1, rev))
      }
    }
    (out.toSeq, cur, userId)
  }

  def updateUser(userId: Long, events: Iterator[EventIn],
                 state: GroupState[SessionState]): Iterator[SessionOut] = {
    val batch = events.toSeq
    if (batch.isEmpty) {
      // only reachable on timeout: the watermark passed the open
      // session's horizon — close and emit it
      if (state.hasTimedOut && state.exists) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.startSec, s.lastSec, s.events, s.revenue, "timeout"))
      } else Iterator.empty
    } else {
      val (closed, open, _) = fold(state.getOption, batch)
      open match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp((s.lastSec + GapSeconds) * 1000)
        case None => if (state.exists) state.remove()
      }
      closed.iterator
    }
  }

  /** Streaming (or batch — Spark runs the same operator) entry. */
  def sessions(events: Dataset[EventIn]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }

  def toEventIn(df: DataFrame): Dataset[EventIn] = {
    import df.sparkSession.implicits._
    df.select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventIn]
  }
}
