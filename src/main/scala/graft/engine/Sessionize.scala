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
 * Runs as two windows over `conv_id` — bounded tasks because a single
 * conversation is bounded (the same per-series argument every
 * whole-series kernel in this engine rests on; corpus-scale skew lives
 * ACROSS conversations, which hash-partition freely). The session
 * rollup is a plain partial-aggregated groupBy. All aggregates are
 * exact: counts, min/max of identical doubles, and sums of
 * integer-valued doubles (text lengths), so results are
 * summation-order independent and oracle-exact.
 */
object Sessionize {

  /** Tag every turn with its 0-based `session_idx` within the
    * conversation: a new session starts when `t - prev_t > gapSeconds`
    * (strict, matching the streaming detector's convention). */
  def assign(series: DataFrame, gapSeconds: Double): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("t"), col("turn_idx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("_gap",
        when(col("t") - lag(col("t"), 1).over(w) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_gap")).over(run))
      .drop("_gap")
  }

  /** One row per (conv, session): span, size and text-mass summary. */
  def sessions(series: DataFrame, gapSeconds: Double): DataFrame =
    assign(series, gapSeconds)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("t")).as("t_start"),
        max(col("t")).as("t_end"),
        (max(col("t")) - min(col("t"))).as("duration"),
        sum(col("m")).as("sum_m"))
}
