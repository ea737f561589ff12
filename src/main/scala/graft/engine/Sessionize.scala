package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization of conversation series — the batch
 * twin of the streaming gap detector
 * ([[graft.streaming.StreamingRollup]]): split each conversation into
 * sessions wherever the inter-turn gap exceeds a threshold, and roll
 * each session up to one summary row.
 *
 * Scale shape: a plain `Window.partitionBy(conv_id)` running sum puts
 * an entire conversation into ONE task — bounded for normal
 * conversations, but an adversarially long (10⁶-turn) agent transcript
 * would buffer whole in a single window task. The session index is
 * therefore computed hierarchically (the same distributed prefix-sum
 * shape as [[graft.operators.Packing]]):
 *
 *  1. turns get a deterministic bounded chunk key
 *     `turn_idx div chunkSize`;
 *  2. per-chunk boundary rows (the last `t` of each chunk) roll up to
 *     a TINY table (one row per chunk, ~turns/chunkSize rows) whose
 *     windows are trivially bounded;
 *  3. gap flags are computed with a lag INSIDE each (conv, chunk) —
 *     the first row of a chunk compares against the previous chunk's
 *     boundary `t` from (2);
 *  4. `session_idx` = within-chunk running sum of flags + the prefix
 *     sum of whole-chunk flag totals, broadcast back.
 *
 * All arithmetic is integer flags + exact comparisons, so the result
 * is identical to the single-window form at any chunkSize (spec-
 * checked), and every corpus-sized window task is bounded by
 * `chunkSize` rows by construction.
 *
 * Required invariant (the transcript contract — BASELINE.json's
 * "stable (conv_id, turn_idx) ordering"): `t` is non-decreasing in
 * `turn_idx` within a conversation, and `turn_idx` is non-negative.
 * Chunking on `turn_idx` then respects the session order `(t,
 * turn_idx)`; the ordering inside each chunk window remains `(t,
 * turn_idx)`, so tie-breaks match the un-chunked form exactly.
 */
object Sessionize {

  /** Tag every turn with its 0-based `session_idx` within the
    * conversation: a new session starts when `t - prev_t > gapSeconds`
    * (strict, matching the streaming detector's convention). */
  def assign(series: DataFrame, gapSeconds: Double,
      chunkSize: Long = 1L << 16): DataFrame = {
    val base = series.withColumn("_chunk", expr(s"turn_idx div ${chunkSize}L"))
    val wChunk = Window.partitionBy(col("conv_id"), col("_chunk"))
      .orderBy(col("t"), col("turn_idx"))
    val runChunk = wChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // (2) per-chunk boundary t — a partial-aggregated groupBy; the lag
    // to the previous chunk runs over this tiny one-row-per-chunk table
    val wBounds = Window.partitionBy(col("conv_id")).orderBy(col("_chunk"))
    val bounds = base.groupBy(col("conv_id"), col("_chunk"))
      .agg(max(col("t")).as("_last_t"))
      .withColumn("_prev_chunk_t", lag(col("_last_t"), 1).over(wBounds))
      .select(col("conv_id"), col("_chunk"), col("_prev_chunk_t"))
    // (3) gap flags: in-chunk lag, chunk-boundary rows fall back to the
    // previous chunk's last t (null for the very first chunk -> no gap).
    // NO broadcast hint on these joins: the side tables are one row per
    // (conv, chunk) — tiny relative to the corpus but proportional to
    // it (billions of conversations -> billions of rows), so AQE must
    // stay free to pick a shuffle join; both joins key on the same
    // (conv_id, _chunk) the chunk windows partition by, so the corpus
    // side reuses its partitioning
    val flagged = base.join(bounds, Seq("conv_id", "_chunk"))
      .withColumn("_prev_t",
        coalesce(lag(col("t"), 1).over(wChunk), col("_prev_chunk_t")))
      .withColumn("_gap",
        when(col("t") - col("_prev_t") > gapSeconds, 1L).otherwise(0L))
      .withColumn("_cum", sum(col("_gap")).over(runChunk))
    // (4) chunk flag totals -> exclusive prefix -> broadcast back
    val wOff = Window.partitionBy(col("conv_id")).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = flagged.groupBy(col("conv_id"), col("_chunk"))
      .agg(sum(col("_gap")).as("_chunk_gaps"))
      .withColumn("_goff", coalesce(sum(col("_chunk_gaps")).over(wOff), lit(0L)))
      .select(col("conv_id"), col("_chunk"), col("_goff"))
    flagged.join(offsets, Seq("conv_id", "_chunk"))
      .withColumn("session_idx", col("_goff") + col("_cum"))
      .drop("_chunk", "_prev_chunk_t", "_prev_t", "_gap", "_cum")
  }

  /** One row per (conv, session): span, size and text-mass summary. */
  def sessions(series: DataFrame, gapSeconds: Double,
      chunkSize: Long = 1L << 16): DataFrame =
    assign(series, gapSeconds, chunkSize)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("t")).as("t_start"),
        max(col("t")).as("t_end"),
        (max(col("t")) - min(col("t"))).as("duration"),
        sum(col("m")).as("sum_m"))
}
