package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._
import StatefulSessions.{EventIn, SessionOut, SessionState, GapSeconds}

/** Spark 4 `transformWithState` twin of [[StatefulSessions]] — the
  * same gap-sessionization semantics expressed in the modern stateful
  * API (SPARK-46815, "arbitrary stateful processing v2"): typed state
  * variables from a handle instead of one opaque `GroupState`, and
  * explicit named timers instead of a single timeout slot.
  *
  * Why it matters at scale: the v2 operator runs on the RocksDB state
  * store with changelog checkpointing, supports multiple independent
  * state variables per key (value/list/map) with per-state TTL, and
  * decouples timer registration from state updates — the API Spark is
  * converging on for production stateful pipelines. The processor
  * below reuses the exact [[StatefulSessions.fold]] transition
  * function, so both formulations emit identical gap-closed sessions
  * (asserted in StatefulSessionsSpec).
  */
object TwsSessions {

  class SessionProcessor extends StatefulProcessor[Long, EventIn, SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timers: TimerValues): Iterator[SessionOut] = {
      val batch = rows.toSeq
      val prev = if (session.exists()) Some(session.get()) else None
      val (closed, open, _) = StatefulSessions.fold(prev, batch)
      // one live timer per key: drop stale registrations, arm the new
      // horizon (fold never returns None for a non-empty batch)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      open match {
        case Some(s) =>
          session.update(s)
          getHandle.registerTimer((s.lastSec + GapSeconds) * 1000)
        case None => session.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (session.exists()) {
        val s = session.get()
        // the watermark passed the open session's horizon — close it
        if (expired.getExpiryTimeInMs >= (s.lastSec + GapSeconds) * 1000) {
          session.clear()
          return Iterator.single(
            SessionOut(key, s.startSec, s.lastSec, s.events, s.revenue, "timeout"))
        }
      }
      Iterator.empty
    }
  }

  /** Streaming entry (requires the RocksDB state store provider — the
    * v2 operator's store contract). */
  def sessions(events: Dataset[EventIn]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  def toEventIn(df: DataFrame): Dataset[EventIn] = StatefulSessions.toEventIn(df)
}
