package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental tier refresh via Structured Streaming. The reference
 * crate is batch-only (SURVEY.md §2.5 — no streaming counterpart);
 * this is the engine-side continuous-aggregate path: the same
 * associative carries the batch cascade uses (n, sum_w, sum_mw —
 * bins.rs:184-194 semantics) maintained incrementally per
 * (conv_id, 1-minute event-time window) with a watermark bounding
 * state. Because the carries are associative and commutative, a
 * closed streaming bucket equals the batch bucket exactly; feature
 * kernels are then computed from the carried sums downstream (or by
 * the batch path over closed buckets — the lambda-architecture
 * split).
 */
object StreamingRollup {

  /** Per-conversation custom state for the gap detector. */
  final case class ConvState(lastTsMicros: Long, turns: Long)

  /** A detected silence longer than the threshold. */
  final case class GapEvent(conv_id: String, gap_start: java.sql.Timestamp,
      gap_seconds: Double, turns_before: Long)

  /**
   * Stateful gap detection over a streaming transcript: emits one
   * event per intra-conversation silence longer than `gapSeconds`.
   * Custom per-key state via flatMapGroupsWithState (the engine-side
   * streaming surface the windowed continuous aggregate can't
   * express); state is one (lastTs, count) pair per conversation,
   * bounded by event-time timeout. Turns arriving within one batch are
   * processed in event-time order; a turn older than the state's
   * watermarked lastTs is ignored (late data policy).
   */
  def gapEvents(turns: org.apache.spark.sql.Dataset[graft.engine.Turn],
      gapSeconds: Double,
      watermark: String = "10 minutes"): org.apache.spark.sql.Dataset[GapEvent] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import turns.sparkSession.implicits._

    def process(convId: String, it: Iterator[graft.engine.Turn],
        state: GroupState[ConvState]): Iterator[GapEvent] = {
      if (state.hasTimedOut) {
        // conversation idle past the horizon: release its state
        state.remove()
        return Iterator.empty
      }
      val sorted = it.toSeq.sortBy(t => (t.ts.getTime, t.turn_idx))
      var st = state.getOption.getOrElse(ConvState(Long.MinValue, 0L))
      val out = Seq.newBuilder[GapEvent]
      sorted.foreach { t =>
        val tsMicros = t.ts.getTime * 1000L
        if (st.lastTsMicros != Long.MinValue && tsMicros > st.lastTsMicros) {
          val gap = (tsMicros - st.lastTsMicros) / 1e6
          if (gap > gapSeconds)
            out += GapEvent(convId, new java.sql.Timestamp(st.lastTsMicros / 1000L),
              gap, st.turns)
        }
        if (tsMicros > st.lastTsMicros)
          st = ConvState(tsMicros, st.turns + 1)
        else st = st.copy(turns = st.turns + 1)
      }
      state.update(st)
      // timeout must land beyond the current watermark
      val wmMs = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(
        math.max(st.lastTsMicros / 1000L + 30L * 60 * 1000, wmMs + 60000L))
      out.result().iterator
    }

    val base =
      if (turns.isStreaming) turns.withWatermark("ts", watermark) else turns
    base.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  /** 1-minute continuous aggregate over a (streaming or batch)
    * transcript DataFrame with the north-rule schema.
    *
    * Late-data semantics (asserted in StreamingRollupSpec):
    *  - within the watermark horizon, out-of-order turns merge into
    *    their bucket's carries (associative sums — converges to the
    *    batch bucket exactly);
    *  - PAST the watermark, rows are DROPPED by the streaming
    *    aggregation (append mode emits a bucket once, when the
    *    watermark passes its window end; the emitted bucket reflects
    *    on-time data only);
    *  - reconciliation of dropped stragglers is the BATCH rebuild
    *    path ([[graft.engine.Rollup.tierFromTurns]] over the full
    *    table, resumable via [[graft.engine.Snapshots]]) — the
    *    standard lambda split: streaming for freshness, periodic
    *    batch rebuild for completeness. */
  def tier1m(turns: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val withSeries = turns
      .withColumn("m", length(col("text")).cast("double"))
      .withColumn("w", lit(1.0))
    val streaming = withSeries.isStreaming
    val base = if (streaming) withSeries.withWatermark("ts", watermark) else withSeries
    base
      .groupBy(col("conv_id"), window(col("ts"), "1 minute").as("win"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("w")).as("sum_w"),
        sum(col("m") * col("w")).as("sum_mw"))
      .select(
        col("conv_id"),
        (unix_micros(col("win.start")) / 60000000L).cast("long").as("bucket"),
        col("n"), col("sum_w"), col("sum_mw"),
        (col("sum_mw") / col("sum_w")).as("bin_m"),
        (col("sum_w") / col("n")).as("bin_w"))
  }
}
