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
    val idleFlushMs =
      org.apache.spark.network.util.JavaUtils.timeStringAsMs(idleFlush)

    def emit(convId: String, st: SessionState, byTimeout: Boolean): SessionEvent =
      SessionEvent(convId, st.sessionIdx, st.nTurns,
        st.tStartMicros / 1e6, st.tEndMicros / 1e6,
        st.tEndMicros / 1e6 - st.tStartMicros / 1e6, st.sumM, byTimeout)

    def process(convId: String, it: Iterator[graft.engine.Turn],
        state: GroupState[SessionState]): Iterator[SessionEvent] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit(convId, _, byTimeout = true))
        state.remove()
        return out.iterator
      }
      val sorted = it.toSeq.sortBy(t => (t.ts.getTime, t.turn_idx))
      val out = Seq.newBuilder[SessionEvent]
      var st = state.getOption.orNull
      sorted.foreach { t =>
        val tsMicros = t.ts.getTime * 1000L
        val m = t.text.length.toDouble
        if (st == null)
          st = SessionState(0L, tsMicros, tsMicros, 1L, m)
        else if (tsMicros < st.tEndMicros) {
          // older than the open session's frontier: dropped (late policy)
        } else if ((tsMicros - st.tEndMicros) / 1e6 > gapSeconds) {
          out += emit(convId, st, byTimeout = false)
          st = SessionState(st.sessionIdx + 1, tsMicros, tsMicros, 1L, m)
        } else
          st = st.copy(tEndMicros = tsMicros, nTurns = st.nTurns + 1,
            sumM = st.sumM + m)
      }
      state.update(st)
      val wmMs = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(
        math.max(st.tEndMicros / 1000L + idleFlushMs, wmMs + 60000L))
      out.result().iterator
    }

    val base =
      if (turns.isStreaming) turns.withWatermark("ts", watermark) else turns
    base.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }
}
