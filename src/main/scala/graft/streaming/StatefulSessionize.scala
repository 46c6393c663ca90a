package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset custom-state path (builder prompt: "for custom
  * state"). Gap-based sessionization with explicit per-key state: each user's
  * open session lives in the state store; an event past the gap closes the
  * session and emits it.
  *
  * Scale: state is partitioned by key across executors (the state store
  * shuffles on the grouping key); memory is one open session per active
  * key. For AvailableNow pipelines that is bounded by the active-key
  * cardinality of the run and open sessions deliberately persist across
  * runs; CONTINUOUS streams should pass `idleFlushMs` so keys that go
  * quiet flush their final session and release their state (without it a
  * departed user's open session would sit in the state store forever).
  */
object StatefulSessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Sessionize a stream of events keyed by user with `gapMs` inactivity.
    * STREAMING: emits closed sessions; open sessions persist in the state
    * store across microbatches/runs (NoTimeout is deliberate for
    * AvailableNow pipelines — the next run's events may extend them).
    * BATCH: there is no later run, so every group's final open session is
    * FLUSHED too — without the flush each user's most recent session
    * silently vanished from batch results (each group is invoked exactly
    * once in batch execution; nothing ever came back for the state). */
  def sessions(events: Dataset[Event], gapMs: Long,
      idleFlushMs: Option[Long] = None): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val flushOpen = !events.isStreaming

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // idle-flush (continuous streams only): the key went quiet past
        // idleFlushMs of PROCESSING time — emit the open session and
        // release its state
        val s = state.get
        state.remove()
        return Iterator.single(Session(userId, s.start, s.end, s.n, s.sum))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val out = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            // min/max, not overwrite: a LATE event from a later microbatch
            // (t inside the open session) must not rewind the session end —
            // a rewound end mis-split every subsequent gap decision and
            // could even emit end < start
            cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            out += Session(userId, s.start, s.end, s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (flushOpen) cur.foreach(s => out += Session(userId, s.start, s.end, s.n, s.sum))
      else cur.foreach { st => // open session persists to the state store
        state.update(st)
        idleFlushMs.foreach(state.setTimeoutDuration)
      }
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(fn)
  }
}
