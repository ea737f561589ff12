package graft.streaming

import org.apache.spark.sql.Dataset

/**
 * Streaming sessionization — the continuous twin of the batch
 * gap-split rollup ([[graft.engine.Sessionize]]): each conversation's
 * turns fold into an OPEN session held as per-key state; a turn
 * arriving more than `gapSeconds` after the previous one CLOSES the
 * session (one summary row emitted, matching the batch
 * `sessions()` schema and values exactly) and opens the next. A
 * conversation idle past its event-time timeout flushes its open
 * session and releases all state, so state is one small fixed-size
 * record per LIVE conversation — never a buffer of turns.
 *
 * Session indices are 0-based per conversation, the gap test is
 * strict (`> gapSeconds`), and aggregates are the same exact sums the
 * batch operator computes — a closed streaming session is bit-equal
 * to its batch counterpart (asserted in StreamingSessionizeSpec).
 * Late-data policy matches [[StreamingRollup.gapEvents]]: within a
 * batch, turns process in (ts, turn_idx) order; a turn older than the
 * state's last timestamp is dropped (the batch rebuild path
 * reconciles, the standard lambda split).
 *
 * Numbering across timeouts: a timeout flush leaves a TOMBSTONE
 * (empty session carrying the next index and last timestamp) behind
 * for one further `idleFlush` horizon, so a conversation resuming
 * within it continues the batch numbering. The tombstone branch needs
 * no explicit gap test: a timeout only fires once the watermark is
 * past tEnd + horizon (and horizon >= gap by construction), so every
 * ON-TIME turn seen after the flush is necessarily > gap past the
 * pre-flush frontier — it starts a new session in the batch operator
 * too; late turns below the frontier are dropped by the same
 * late-data policy as the open-session branch. Beyond the tombstone
 * horizon state is truly dropped and `session_idx` restarts at 0 —
 * the inherent watermark-bounded-state trade; `(conv_id, t_start)` is
 * the durable session key, and the batch rebuild is the reconciler.
 */
object StreamingSessionize {

  /** Open-session state: one fixed-size record per live conversation. */
  final case class SessionState(sessionIdx: Long, tStartMicros: Long,
      tEndMicros: Long, nTurns: Long, sumM: Double)

  /** One closed (or timeout-flushed) session summary — the batch
    * `sessions()` row shape with t in epoch seconds. */
  final case class SessionEvent(conv_id: String, session_idx: Long,
      n_turns: Long, t_start: Double, t_end: Double, duration: Double,
      sum_m: Double, closed_by_timeout: Boolean)

  def sessions(turns: Dataset[graft.engine.Turn], gapSeconds: Double,
      watermark: String = "10 minutes",
      idleFlush: String = "30min"): Dataset[SessionEvent] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import turns.sparkSession.implicits._
    // the flush horizon must cover the gap threshold: a session is
    // only timeout-flushed once the watermark is past tEnd + horizon,
    // so with horizon >= gap every on-time future turn would have
    // started a new session in the batch operator too — numbering
    // stays batch-identical for on-time data at any parameter choice
    val idleFlushMs = math.max(
      org.apache.spark.network.util.JavaUtils.timeStringAsMs(idleFlush),
      math.ceil(gapSeconds * 1000.0).toLong)

    def emit(convId: String, st: SessionState, byTimeout: Boolean): SessionEvent =
      SessionEvent(convId, st.sessionIdx, st.nTurns,
        st.tStartMicros / 1e6, st.tEndMicros / 1e6,
        st.tEndMicros / 1e6 - st.tStartMicros / 1e6, st.sumM, byTimeout)

    val streaming = turns.isStreaming

    def process(convId: String, it: Iterator[graft.engine.Turn],
        state: GroupState[SessionState]): Iterator[SessionEvent] = {
      if (state.hasTimedOut) {
        val st = state.getOption.orNull
        if (st != null && st.nTurns > 0L) {
          // flush the open session; leave a tombstone carrying the next
          // index + frontier so a resume within one more horizon keeps
          // the batch numbering (no gap test needed on resume: the
          // watermark is already past frontier + horizon >= gap, so
          // any on-time resume is a new batch session by definition)
          state.update(SessionState(st.sessionIdx + 1, st.tEndMicros,
            st.tEndMicros, 0L, 0.0))
          state.setTimeoutTimestamp(
            math.max(st.tEndMicros / 1000L + 2L * idleFlushMs,
              state.getCurrentWatermarkMs() + 60000L))
          return Iterator.single(emit(convId, st, byTimeout = true))
        }
        state.remove() // tombstone expired: numbering may restart
        return Iterator.empty
      }
      val sorted = it.toSeq.sortBy(t => (t.ts.getTime, t.turn_idx))
      val out = Seq.newBuilder[SessionEvent]
      var st = state.getOption.orNull
      sorted.foreach { t =>
        val tsMicros = t.ts.getTime * 1000L
        val m = t.text.length.toDouble
        if (st == null)
          st = SessionState(0L, tsMicros, tsMicros, 1L, m)
        else if (st.nTurns == 0L) {
          // tombstone: resume numbering from it (frontier = pre-flush
          // tEnd; anything at/after it starts the next session)
          if (tsMicros >= st.tEndMicros)
            st = SessionState(st.sessionIdx, tsMicros, tsMicros, 1L, m)
        } else if (tsMicros < st.tEndMicros) {
          // older than the open session's frontier: dropped (late policy)
        } else if ((tsMicros - st.tEndMicros) / 1e6 > gapSeconds) {
          out += emit(convId, st, byTimeout = false)
          st = SessionState(st.sessionIdx + 1, tsMicros, tsMicros, 1L, m)
        } else
          st = st.copy(tEndMicros = tsMicros, nTurns = st.nTurns + 1,
            sumM = st.sumM + m)
      }
      state.update(st)
      if (streaming) {
        // batch execution has no watermark (getCurrentWatermarkMs
        // throws) and never fires timeouts anyway
        val wmMs = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
          math.max(st.tEndMicros / 1000L + idleFlushMs, wmMs + 60000L))
      }
      out.result().iterator
    }

    val base = if (streaming) turns.withWatermark("ts", watermark) else turns
    base.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }
}
